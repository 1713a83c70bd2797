package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate the per-category [[graft.ops.QueryPack]]s;
  * the driver runs every entry at sf0.01 through [[Verify]] and hash-matches
  * against DuckDB, and times them at sf0.1 through [[Bench]].
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    Aggregates, Joins, Windows, SortSetOps, Scalars, Keyed, ScansUdx, Reshape,
    TimeSeries, Fuzzy, Skew, Scd, Merge, Layout, Tpch, Graph, llm.Dedup,
    llm.Similarity, llm.TextStats, llm.Multimodal, llm.Ranking, llm.Curation,
    llm.Classify, llm.UnicodeGates
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    uniq("queries", packs.flatMap(_.queries))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    uniq("oracle", packs.flatMap(_.oracle))

  /** A name collision across packs would silently pair a query with the
    * wrong oracle (last pack wins in toMap) — fail loudly instead.
    */
  private def uniq[V](what: String, all: Seq[(String, V)]): Map[String, V] = {
    val dups = all.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate $what names across packs: ${dups.mkString(", ")}")
    all.toMap
  }
}
