package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
object Skew {

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
}
