package graft.ops

import java.nio.file.Paths
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.Udx

/** Source-format scans and the UDx surface as gated queries (SURVEY.md §2
  * C2, C33, B3):
  *
  *  - C2: CSV and JSON scans with EXPLICIT schemas (no inference — the
  *    reference's static-schema discipline, schema_manager.py). The
  *    fixture table is rendered to the format under test first, then
  *    scanned back; the oracle reads the same rows from parquet, so the
  *    gate proves the scan+schema path end-to-end.
  *  - C33: a scalar UDF in a gated query — the UDF mirrors a SQL
  *    expression so its results stay oracle-checkable (the design rule:
  *    UDx allowed, but never opaque).
  *  - B3: keyed produce / partition-by-key — `repartition(key)` must
  *    co-locate every record of a key in exactly one partition (Kafka's
  *    keyed-produce guarantee, sample_kafka_process.sh:194-204). The
  *    query PROVES co-location by counting distinct partition ids per
  *    key; the oracle pins the expected invariant.
  */
object ScansUdx extends QueryPack {

  /** One fixture render per (format, sf dir) per JVM, into a
    * PROCESS-UNIQUE scratch dir (pid in the path): concurrent Verify/Bench
    * runs can't clobber each other's render mid-read, and repeat
    * invocations of the gated query (Bench reps) skip the single-task
    * `coalesce(1)` write entirely — the render is fixture plumbing, not
    * part of the scan being measured (VERDICT r2 #4 / ADVICE r2).
    */
  private val rendered = scala.collection.concurrent.TrieMap.empty[String, String]

  private[ops] def renderOnce(fmt: String, dir: String)(write: String => Unit): String =
    rendered.getOrElseUpdate(s"$fmt|$dir", {
      val path = Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft_scan_${fmt}_p${ProcessHandle.current().pid()}_" +
          dir.replaceAll("[^a-zA-Z0-9]", "_")).toString
      write(path)
      // pid-unique dirs would otherwise accumulate across JVM runs
      removeOnExit(path)
      path
    })

  private def removeOnExit(path: String): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(path))
    }))

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  /** C2 CSV scan: nation → CSV (header) → read back with explicit schema,
    * then a small join+agg so mis-typed columns would be caught.
    */
  def scanCsv(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = renderOnce("csv", dir) { p =>
      Tables.nation(spark, dir).coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(p)
    }
    val nation = spark.read.schema(nationSchema).option("header", "true").csv(path)
    nation.join(broadcast(Tables.region(spark, dir)),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n_nations"), min($"n_name").as("first_nation"))
      .orderBy($"r_name")
  }

  /** C2 JSON scan: supplier → JSON lines → read back with explicit schema. */
  def scanJson(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = renderOnce("json", dir) { p =>
      Tables.supplier(spark, dir).coalesce(1).write.mode("overwrite").json(p)
    }
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType)))
    spark.read.schema(schema).json(path)
      .select($"s_suppkey", $"s_name",
              ($"s_acctbal" >= 0).as("in_good_standing"))
      .orderBy($"s_suppkey")
  }

  /** C2 (columnar twin) ORC scan: customer → ORC → read back with
    * explicit schema — the other columnar format Spark ships natively
    * (predicate pushdown, column pruning, and vectorized reads work the
    * same as parquet). The oracle reads the same rows from parquet, so
    * the gate proves the ORC round-trip end-to-end.
    */
  def scanOrc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = renderOnce("orc", dir) { p =>
      Tables.customer(spark, dir)
        .select($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal")
        .coalesce(1).write.mode("overwrite").orc(p)
    }
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType)))
    spark.read.schema(schema).orc(path)
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
           min($"c_custkey").as("min_key"), max($"c_custkey").as("max_key"))
      .orderBy($"c_nationkey")
  }

  /** B3 keyed produce: after `repartition(key)`, every key lives in
    * exactly one partition — asserted inside the query so the oracle can
    * pin it (`spark_partition_id` itself is engine-internal and never
    * emitted).
    */
  def keyedColocate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .repartition(8, $"user_id")
      .select($"user_id", spark_partition_id().as("pid"))
      .groupBy($"user_id")
      .agg(countDistinct($"pid").as("n_partitions"))
      .agg(count(lit(1)).as("n_keys"),
           (max($"n_partitions") === 1).as("all_colocated"))
  }

  /** C33 scalar UDF in a gated query: slugify part names, aggregate by
    * first slug letter.
    */
  def udfSlugify(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.part(spark, dir)
      .select(Udx.slugify($"p_name").as("slug"))
      .groupBy(substring($"slug", 1, 1).as("initial"))
      .agg(count(lit(1)).as("n_parts"),
           countDistinct($"slug").as("n_distinct_slugs"))
      .orderBy($"initial")
  }

  /** SQL-defined scalar function (Spark 4 `CREATE FUNCTION … RETURN`) —
    * the declarative UDF path: the body is a SQL expression, so unlike a
    * JVM closure it stays INSIDE Catalyst (inlined at plan time,
    * codegen'd, pushdown-transparent — `.explain` shows no
    * BatchEvalPython/ScalaUDF barrier). This is the preferred extension
    * point whenever the logic is expressible as SQL; DuckDB's twin is
    * CREATE MACRO, and the oracle inlines the same expression by hand.
    */
  def sqlUdf(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_net_revenue(
        |  price DOUBLE, disc DOUBLE, tax DOUBLE)
        |RETURNS DOUBLE
        |RETURN price * (1.0 - disc) * (1.0 + tax)""".stripMargin)
    spark.sql(
      """SELECT l_orderkey, l_linenumber,
        |  graft_net_revenue(l_extendedprice, l_discount, l_tax) AS net_rev
        |FROM lineitem
        |WHERE graft_net_revenue(l_extendedprice, l_discount, l_tax) > 60000.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_udf"         -> (sqlUdf _),
    "scan_csv"        -> (scanCsv _),
    "scan_json"       -> (scanJson _),
    "scan_orc"        -> (scanOrc _),
    "keyed_colocate"  -> (keyedColocate _),
    "udf_slugify"     -> (udfSlugify _)
  )

  def oracle: Map[String, String] = Map(
    // the UDF body inlined by hand — per-row scalar float math is
    // bit-identical when the expression tree is spelled identically
    "sql_udf" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS net_rev
        |FROM lineitem
        |WHERE l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) > 60000.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "scan_csv" ->
      """SELECT r_name, COUNT(*) AS n_nations, MIN(n_name) AS first_nation
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "scan_json" ->
      """SELECT s_suppkey, s_name, s_acctbal >= 0 AS in_good_standing
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "scan_orc" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers,
        |  MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "keyed_colocate" ->
      """SELECT COUNT(DISTINCT user_id) AS n_keys, TRUE AS all_colocated
        |FROM events""".stripMargin,
    "udf_slugify" ->
      """SELECT substr(slug, 1, 1) AS initial, COUNT(*) AS n_parts,
        |  COUNT(DISTINCT slug) AS n_distinct_slugs
        |FROM (SELECT regexp_replace(lower(trim(p_name)), '[^a-z0-9]+', '-', 'g')
        |        AS slug FROM part)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
