package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of verifiable queries. Each pack contributes
  * `queries` (Spark implementations, keyed by query name) and `oracle`
  * (DuckDB-runnable ANSI SQL over the same parquet tables) entries that
  * [[graft.SparkEntry]] aggregates for the driver's correctness gate.
  *
  * Discipline (SURVEY.md §5/§7): every oracle query totally ordered with a
  * tie-free ORDER BY mirrored by an `orderBy` in the Spark form; aggregate /
  * computed columns aliased identically on both sides; float aggregates go
  * through [[graft.Det]] so results are bit-identical regardless of
  * partitioning.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
