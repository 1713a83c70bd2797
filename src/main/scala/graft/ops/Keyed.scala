package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Keyed-stream semantics from the reference's Kafka tooling (SURVEY.md §2
  * Tier B): log compaction (latest-per-key), tombstone deletes, offset-range
  * scans. The `events` fixture stands in for a topic: `event_id` is the
  * offset surrogate, `user_id` the record key (FIXTURES.md §2).
  *
  * Reference behavior: `cleanup.policy: compact` keeps only the most recent
  * record per key (/root/reference/sample_kafka_process.sh:165-192); a null
  * value deletes the key (…:206-215); consumers can start from an explicit
  * offset (…:136-143).
  *
  * Scale notes: latest-per-key is a single aggregation via
  * `max_by(struct(*), offset)` — one shuffle on the key with map-side
  * partials. (Physically Spark plans SortAggregate, not HashAggregate —
  * a struct-typed buffer isn't hash-aggregable — but the partial/final
  * split still combines map-side, so the shuffle carries one row per
  * (partition, key); the row_number() window form shuffles EVERY row and
  * then sorts whole partitions. PlanSpec pins this shape.)
  */
object Keyed extends QueryPack {

  /** B1 latest-per-key (log compaction view of the stream). */
  def latestPerKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(max_by(struct($"event_id", $"event_type", $"value"), $"event_id").as("last"))
      .select($"user_id", $"last.event_id".as("last_event_id"),
              $"last.event_type".as("last_event_type"), $"last.value".as("last_value"))
      .orderBy($"user_id")
  }

  /** B2 tombstone semantics on top of B1: a key whose latest record is the
    * tombstone marker disappears from the compacted view ('error' plays
    * the null-value tombstone in the fixture).
    */
  def tombstoneDelete(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(max_by(struct($"event_id", $"event_type", $"value"), $"event_id").as("last"))
      .filter($"last.event_type" =!= "error")
      .select($"user_id", $"last.event_id".as("last_event_id"),
              $"last.event_type".as("last_event_type"))
      .orderBy($"user_id")
  }

  /** B4 offset-range scan: consume from offset N to end (batch twin of
    * startingOffsets) — the filter prunes parquet row groups via min/max
    * stats just as the Kafka source prunes by offset.
    */
  def offsetRange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .filter($"event_id" >= 9000L)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), min($"event_id").as("first_offset"),
           max($"event_id").as("last_offset"))
      .orderBy($"event_type")
  }

  /** A5–A8 + A10/A11 reference-processor chain as one query: the keyed
    * view of events folded through the ACTUAL pipeline abstraction —
    * NoOp → column guard → uppercase-value transform
    * (custom_processors.py:49) via [[graft.pipeline.Pipeline.applyProcessors]].
    * The fold is lazy, so Catalyst fuses the whole chain into the scan;
    * `.explain` shows a single Project over the file scan, identical to
    * the hand-fused form.
    */
  def uppercaseTransform(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.pipeline._
    val keyed = Tables.events(spark, dir)
      .select($"event_id".cast("string").as("key"), $"event_type".as("value"))
    val chain = Seq(
      new NoOpProcessor(),
      new RequireColumnProcessor(graft.config.Conf(Map("column" -> "value"))),
      new UppercaseValueProcessor())
    Pipeline.applyProcessors(keyed, chain)
      .getOrElse(sys.error("pipeline short-circuited unexpectedly"))
      .orderBy($"key")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "keyed_latest_per_key"  -> (latestPerKey _),
    "keyed_tombstone"       -> (tombstoneDelete _),
    "keyed_offset_range"    -> (offsetRange _),
    "keyed_uppercase_chain" -> (uppercaseTransform _)
  )

  def oracle: Map[String, String] = Map(
    "keyed_latest_per_key" ->
      """SELECT user_id, ARG_MAX(event_id, event_id) AS last_event_id,
        |  ARG_MAX(event_type, event_id) AS last_event_type,
        |  ARG_MAX(value, event_id) AS last_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "keyed_tombstone" ->
      """SELECT user_id, last_event_id, last_event_type FROM (
        |  SELECT user_id, ARG_MAX(event_id, event_id) AS last_event_id,
        |    ARG_MAX(event_type, event_id) AS last_event_type
        |  FROM events GROUP BY user_id
        |) WHERE last_event_type <> 'error'
        |ORDER BY user_id""".stripMargin,
    "keyed_offset_range" ->
      """SELECT event_type, COUNT(*) AS n, MIN(event_id) AS first_offset,
        |  MAX(event_id) AS last_offset
        |FROM events WHERE event_id >= 9000
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "keyed_uppercase_chain" ->
      """SELECT CAST(event_id AS VARCHAR) AS key, UPPER(event_type) AS value
        |FROM events ORDER BY key""".stripMargin
  )
}
