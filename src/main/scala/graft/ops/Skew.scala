package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.{Det, Tables}

/** Skew-mitigation utilities (SURVEY.md §2 scale posture: "skewed keys →
  * salting or AQE skew-join").
  *
  * Spark's AQE splits skewed SHUFFLE partitions at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) and is the
  * first line of defense. Explicit salting remains the tool when AQE
  * can't help: aggregation hot keys (AQE skew handling applies to joins,
  * not aggregates) and broadcast-ineligible skewed joins where one KEY —
  * not one partition — dominates.
  */
object Skew extends QueryPack {

  /** Decimal accumulator type for two-phase deterministic sums: partials
    * stay decimal across BOTH aggregation stages and only the final value
    * casts to double, so the result is bit-identical to a one-stage
    * [[graft.Det.dsum]] regardless of salt factor or partitioning.
    */
  private val Dec = DecimalType(30, 6)

  /** Deterministic row salt in [0, saltFactor): hash of the given
    * columns, NOT rand() — reruns and retried tasks must salt a row
    * identically or results become nondeterministic under task retry.
    */
  def saltOf(saltFactor: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(saltFactor.toLong)).cast("int")

  /** Salted inner equi-join for a skewed LEFT side: the left's hot keys
    * spread across `saltFactor` sub-keys; the (small-ish, but too big or
    * too dynamic to broadcast) right side replicates ×saltFactor so every
    * sub-key finds its match. Result set is identical to
    * `left.join(right, key)` — verified property in SkewSpec.
    *
    * Cost model: right side grows ×saltFactor (keep saltFactor modest,
    * 8–32); the left shuffle spreads uniformly instead of hammering one
    * reducer. For 100 TB facts with a few pathological keys, salt ONLY
    * the hot keys (filter-split + union) — this helper salts uniformly
    * for simplicity and is the building block for that refinement.
    */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
                     saltFactor: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      saltOf(saltFactor, left.columns.map(col).toIndexedSeq: _*))
    val replicated = right.withColumn("_salt",
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (partial → final) aggregation for hot-key group-bys: the
    * salt splits each key's rows across reducers for the heavy first
    * aggregation; the cheap second pass merges the per-salt partials.
    * Works for any algebraic aggregate expressed as (partial, merge).
    */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      saltOf(saltFactor, df.columns.map(col).toIndexedSeq: _*))
    salted.groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n"))
  }

  /** Gate: two-phase salted aggregation over `events` keyed by the
    * low-cardinality (therefore hot) `event_type`. Stage 1 groups by
    * (key, salt) so one key's rows spread across `saltFactor` reducers;
    * stage 2 merges the tiny per-salt partials. Sums accumulate in exact
    * decimal through both stages (see [[Dec]]), so the oracle's one-stage
    * sum matches bit-for-bit. At 100 TB this is the groupBy shape that
    * survives a key owning 30% of the rows — AQE rebalances skewed JOIN
    * partitions but not aggregate hot keys; salting is the fix there.
    */
  def saltedAggQ(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.withColumn("_salt", saltOf(16, col("event_id")))
      .groupBy(col("event_type"), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col("value").cast(Dec)).as("_sum"))
      .groupBy(col("event_type"))
      .agg(sum(col("_n")).as("n"), sum(col("_sum")).cast("double").as("total"))
      .orderBy(col("event_type"))
  }

  /** Gate: salted fact-to-dim equi-join (orders → customer on custkey),
    * then a per-segment rollup. The dim replicates ×saltFactor, the fact
    * salts deterministically; the join result is identical to the plain
    * join, which is exactly what the oracle runs. The aggregate keeps the
    * gated output small while still forcing every joined row to exist.
    */
  def saltedJoinQ(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
      .withColumnRenamed("c_custkey", "o_custkey")
    saltedEquiJoin(o, c, "o_custkey", saltFactor = 16)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("total"))
      .orderBy(col("c_mktsegment"))
  }

  /** Gate: key-distribution census — the diagnostic you run BEFORE
    * choosing a mitigation (salt factor, broadcast, AQE trust). For a
    * prospective join/groupBy key, the log₂-bucketed histogram of group
    * sizes plus each bucket's share of total rows: a healthy key shows
    * mass in small buckets; a key where one bucket's few keys own most
    * rows is the salting candidate. All derivation is integer (the
    * bucket is `length(bin(n))` = ⌊log₂ n⌋ + 1 — the [[graft.ops.llm]]
    * len-histogram device — and shares are integer ppm), so the census
    * is exact at any scale. One aggregate over the key + one tiny
    * histogram aggregate; the scalar total broadcasts.
    */
  def keyStatsQ(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val hist = sizes
      .withColumn("bucket", length(bin(col("n"))).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
           max(col("n")).as("max_group"))
    // r18 (committed scan census): the share denominators are the SUMS
    // of the histogram's own columns, so they come from an unpartitioned
    // window over the bucket frame — bounded by construction at ≤ 64
    // rows (bucket = bit-length of a long) — instead of a second
    // aggregate over `sizes`, which re-derived the orders scan + key
    // aggregate per consumer. One orders pass at any scale.
    val whole = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("_total", sum(col("n_rows")).over(whole))
      .withColumn("_keys", sum(col("n_keys")).over(whole))
      .select(col("bucket"), col("n_keys"), col("n_rows"), col("max_group"),
        expr("(1000000 * n_rows) div _total").as("rows_share_ppm"),
        expr("(1000000 * n_keys) div _keys").as("keys_share_ppm"))
      .orderBy(col("bucket"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_agg"  -> (saltedAggQ _),
    "skew_salted_join" -> (saltedJoinQ _),
    "skew_key_stats"   -> (keyStatsQ _)
  )

  def oracle: Map[String, String] = Map(
    // the salt is a physical rewrite: the oracle is the PLAIN aggregate
    "skew_salted_agg" ->
      s"""SELECT event_type, COUNT(*) AS n, ${Det.sqlSum("value")} AS total
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "skew_salted_join" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n, ${Det.sqlSum("o_totalprice")} AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // same ⌊log₂ n⌋+1 bucket via the binary-string length, same integer
    // ppm shares
    "skew_key_stats" ->
      """WITH sizes AS (
        |  SELECT o_custkey, COUNT(*)::BIGINT AS n FROM orders GROUP BY 1),
        |tot AS (SELECT SUM(n)::BIGINT AS t, COUNT(*)::BIGINT AS k FROM sizes),
        |hist AS (SELECT len(bin(n))::BIGINT AS bucket,
        |           COUNT(*)::BIGINT AS n_keys, SUM(n)::BIGINT AS n_rows,
        |           MAX(n)::BIGINT AS max_group
        |         FROM sizes GROUP BY 1)
        |SELECT bucket, n_keys, n_rows, max_group,
        |  ((1000000 * n_rows) // t)::BIGINT AS rows_share_ppm,
        |  ((1000000 * n_keys) // k)::BIGINT AS keys_share_ppm
        |FROM hist CROSS JOIN tot ORDER BY bucket""".stripMargin
  )
}
