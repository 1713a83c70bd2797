package graft.state

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental batch processing over a partitioned table — the batch twin
  * of streaming's offset tracking (and the Airflow-style "process only
  * new partitions" pattern). A high-water mark per job is persisted in
  * [[OffsetStore]] (atomic replace, crash leaves the previous mark), and
  * each planning call returns ONLY partitions above the mark.
  *
  * Scale shape: the `> hwm` predicate is on the PARTITION column, so
  * Spark prunes old directories at listing time — planning an increment
  * over a 10-year table touches only the new partitions, and the
  * `latest` probe aggregates just those. Committing AFTER the downstream
  * write gives at-least-once processing (re-runs reprocess the same
  * increment, never skip one) — idempotent sinks (parquet overwrite by
  * partition, MERGE) make it effectively exactly-once, the same contract
  * Spark's own file sources offer.
  */
object IncrementalBatch {

  /** One planned increment. `commit()` persists the new mark and MUST be
    * called only after the increment's output is durably written.
    */
  final case class Increment(df: DataFrame, latest: Option[Long],
                             private val store: OffsetStore,
                             private val job: String) {
    def isEmpty: Boolean = latest.isEmpty
    def commit(): Unit = latest.foreach(store.saveOffset(job, "hwm", _))
  }

  /** Plan the next increment of `path` for `job`. `encode` maps the
    * partition column to a monotone BIGINT (e.g. `'yyyy-MM'` →
    * `202401`-style) — string marks stay orderable as longs.
    */
  def plan(spark: SparkSession, store: OffsetStore, job: String,
           path: String, partCol: String,
           encode: Column => Column = identity): Increment = {
    val hwm = store.loadOffset(job, "hwm") // 0 when never committed
    val enc = encode(col(partCol)).cast("long")
    val df = spark.read.parquet(path).where(enc > hwm)
    val latest = df.agg(max(enc)).head().get(0) match {
      case null      => None
      case l: Long   => Some(l)
      case other     => Some(other.toString.toLong)
    }
    Increment(df, latest, store, job)
  }
}
