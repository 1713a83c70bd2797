package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_agg"  -> (saltedAggQ _),
    "skew_salted_join" -> (saltedJoinQ _)
  )

  def oracle: Map[String, String] = Map(
    // the salt is a physical rewrite: the oracle is the PLAIN aggregate
    "skew_salted_agg" ->
      s"""SELECT event_type, COUNT(*) AS n, ${Det.sqlSum("value")} AS total
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "skew_salted_join" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n, ${Det.sqlSum("o_totalprice")} AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
