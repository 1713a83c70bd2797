package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Physical data-layout operators — the techniques that make a 100 TB scan
  * cheap before any operator runs. The reference leaves layout to Kafka
  * partitions (`sample_kafka_process.sh:75-76` — one partition, dev-grade);
  * at warehouse scale layout IS the optimizer's biggest lever, so the pack
  * proves the three standard moves on real written data, not just claims:
  *
  *  - `layout_dpp_prune`: a date-partitioned fact table where a filter on
  *    the dim side prunes fact partitions AT RUNTIME (dynamic partition
  *    pruning). PlanSpec pins the `dynamicpruning` subquery in the scan's
  *    PartitionFilters — the difference between reading 3 months and
  *    reading all 80 at 100 TB.
  *  - `layout_bucketed_join`: both join sides bucketed on the join key at
  *    write time → SortMergeJoin with ZERO hash exchanges, and the
  *    follow-on per-key aggregate reuses the same bucketing. This is the
  *    write-once/join-many pattern for a fact table joined every hour.
  *  - `layout_zorder`: a Z-order (Morton) clustering key interleaving two
  *    dimensions, with per-block min/max stats — the layout that makes
  *    file-level min/max pruning work for BOTH predicates at once.
  *    Integer-only bit math, replayed exactly by the oracle.
  */
object Layout extends QueryPack {

  /** Q1-months dim filter: selective on the partition column. */
  private val dppMonths = Seq("01", "02", "03")

  /** layout_dpp_prune — orders re-written partitioned by month (once per
    * JVM, process-unique scratch dir), then joined to a filtered month dim.
    * Catalyst turns the dim filter into a runtime IN-subquery on the fact
    * scan's partition column: only matching directories are listed/read.
    */
  def dppPrune(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = ScansUdx.renderOnce("dpp_orders", dir) { p =>
      Tables.orders(spark, dir)
        .withColumn("o_month", date_format($"o_orderdate", "yyyy-MM"))
        .write.mode("overwrite").partitionBy("o_month").parquet(p)
    }
    val fact = spark.read.parquet(path)
    val dim = Tables.orders(spark, dir)
      .select(date_format($"o_orderdate", "yyyy-MM").as("m"))
      .where(substring($"m", 6, 2).isin(dppMonths: _*))
      .distinct()
    fact.join(broadcast(dim), fact("o_month") === dim("m"))
      .groupBy($"o_month")
      .agg(count(lit(1)).as("n_orders"), Det.dsum($"o_totalprice").as("revenue"))
      .orderBy($"o_month")
  }

  /** One bucketed-table pair per (dir) per JVM. External tables with
    * process-unique names AND paths (concurrent runs can't collide);
    * single writer task → exactly one file per bucket, so the scan also
    * provides the sort order (no Sort before the merge join).
    */
  private val bucketed = scala.collection.concurrent.TrieMap.empty[String, (String, String)]

  private def bucketedOnce(spark: SparkSession, dir: String): (String, String) =
    bucketed.getOrElseUpdate(dir, {
      val tag = s"p${ProcessHandle.current().pid()}_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      val (ot, ct) = (s"graft_bkt_orders_$tag", s"graft_bkt_customer_$tag")
      def path(t: String) =
        java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"), t).toString
      spark.sql(s"DROP TABLE IF EXISTS $ot")
      spark.sql(s"DROP TABLE IF EXISTS $ct")
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(1)
        .write.mode("overwrite")
        .bucketBy(16, "o_custkey").sortBy("o_custkey")
        .option("path", path(ot)).format("parquet").saveAsTable(ot)
      Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"))
        .repartition(1)
        .write.mode("overwrite")
        .bucketBy(16, "c_custkey").sortBy("c_custkey")
        .option("path", path(ct)).format("parquet").saveAsTable(ct)
      (ot, ct)
    })

  /** layout_bucketed_join — fact⋈dim on the bucket key, then a per-key
    * aggregate. Both sides expose HashPartitioning(16) from the files
    * themselves, so neither the join nor the aggregate shuffles: the only
    * Exchange in the plan is the final presentation sort. The `merge` hint
    * keeps the small side out of a broadcast so the bucketing is what's
    * being exercised (at 100 TB neither side broadcasts anyway).
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (ot, ct) = bucketedOnce(spark, dir)
    spark.table(ot).hint("merge")
      .join(spark.table(ct), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey")
      .agg(count(lit(1)).as("n_orders"), Det.dsum($"o_totalprice").as("spend"))
      .orderBy($"c_custkey")
  }

  /** Morton interleave of two 6-bit dims, generated symmetrically for both
    * engines: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    */
  private def zExpr(shiftL: (String, Int) => String,
                    shiftR: (String, Int) => String): String =
    (0 until 6).flatMap { i =>
      Seq(shiftL(s"(${shiftR("za", i)} & 1)", 2 * i + 1),
          shiftL(s"(${shiftR("zb", i)} & 1)", 2 * i))
    }.mkString("(", " + ", ")")

  private val zSpark = zExpr((e, n) => s"shiftleft($e, $n)", (e, n) => s"shiftright($e, $n)")
  private val zDuck  = zExpr((e, n) => s"($e << $n)", (e, n) => s"($e >> $n)")

  /** layout_zorder — cluster `part` by a Z-value over (p_size, price
    * bucket) and report per-block extent stats. Writing files in z-value
    * order gives every file a tight min/max box on BOTH columns, so a
    * predicate on either dimension prunes files; the block stats emitted
    * here are exactly the pruning index a 100 TB table would carry.
    */
  def zorder(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .withColumn("za", least($"p_size", lit(63)).cast("int"))
      .withColumn("zb", expr("CAST(floor((p_retailprice - 900.0) * 0.64) AS INT) % 64"))
      .withColumn("zval", expr(zSpark).cast("long"))
      .withColumn("zblock", expr("shiftright(zval, 6)").cast("long"))
      .groupBy($"zblock")
      .agg(count(lit(1)).as("n_parts"),
           min($"p_partkey").as("min_key"), max($"p_partkey").as("max_key"),
           min($"p_size").cast("long").as("min_size"),
           max($"p_size").cast("long").as("max_size"))
      .orderBy($"zblock")
  }

  /** Post-compaction file census — what [[compact]] returns. */
  final case class CompactStats(filesBefore: Int, filesAfter: Int, rows: Long)

  /** Small-file compaction — the maintenance job every streaming or
    * incremental writer needs: N tiny files (one per micro-batch per
    * partition) become a few range-sorted files with bounded record
    * counts. `repartitionByRange(sortCol)` gives files with DISJOINT key
    * ranges (so file-level min/max pruning works after compaction) and
    * `sortWithinPartitions` orders rows inside each file (so row-group
    * stats prune too); `maxRecordsPerFile` rolls any oversized range.
    *
    * Scale: one range shuffle of the data being compacted (range
    * boundaries come from Spark's reservoir sampling of the sort key) —
    * the same cost as the terminal sort any rewrite pays; no driver
    * materialization. Compaction of a partitioned table runs this
    * per-partition, embarrassingly parallel.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              sortCol: String, targetFiles: Int,
              maxRecordsPerFile: Long = Long.MaxValue): CompactStats = {
    def parquetFiles(d: String): Int =
      Option(new java.io.File(d).listFiles()).fold(0)(
        _.count(f => f.getName.endsWith(".parquet")))
    val in = spark.read.parquet(inDir)
    in.repartitionByRange(targetFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite").parquet(outDir)
    CompactStats(parquetFiles(inDir), parquetFiles(outDir),
                 spark.read.parquet(outDir).count())
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_dpp_prune"     -> (dppPrune _),
    "layout_bucketed_join" -> (bucketedJoin _),
    "layout_zorder"        -> (zorder _)
  )

  def oracle: Map[String, String] = Map(
    // the partitioned rewrite is a physical layout change only: the oracle
    // is the same query over the original parquet
    "layout_dpp_prune" ->
      s"""SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
         |  COUNT(*) AS n_orders, ${Det.sqlSum("o_totalprice")} AS revenue
         |FROM orders
         |WHERE substr(strftime(o_orderdate, '%Y-%m'), 6, 2) IN
         |  (${dppMonths.map(m => s"'$m'").mkString(", ")})
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // bucketing is a physical rewrite too: oracle = the plain join
    "layout_bucketed_join" ->
      s"""SELECT c_custkey, COUNT(*) AS n_orders,
         |  ${Det.sqlSum("o_totalprice")} AS spend
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "layout_zorder" ->
      s"""WITH z AS (
         |  SELECT p_partkey, p_size,
         |    LEAST(p_size, 63) AS za,
         |    CAST(floor((p_retailprice - 900.0) * 0.64) AS INTEGER) % 64 AS zb
         |  FROM part),
         |v AS (SELECT p_partkey, p_size, CAST($zDuck AS BIGINT) AS zval FROM z)
         |SELECT CAST(zval >> 6 AS BIGINT) AS zblock, COUNT(*) AS n_parts,
         |  MIN(p_partkey) AS min_key, MAX(p_partkey) AS max_key,
         |  CAST(MIN(p_size) AS BIGINT) AS min_size,
         |  CAST(MAX(p_size) AS BIGINT) AS max_size
         |FROM v GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
