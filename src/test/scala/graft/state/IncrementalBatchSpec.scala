package graft.state

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** At-least-once incremental planning over a partitioned table: only
  * partitions above the committed high-water mark are returned, an
  * uncommitted increment replays identically, and commit advances the
  * mark durably.
  */
class IncrementalBatchSpec extends SparkSpec {

  import spark.implicits._

  private def enc(c: org.apache.spark.sql.Column) =
    regexp_replace(c, "-", "")

  test("plan → commit → plan processes each partition exactly once") {
    val dir = tmpDir("inc_batch")
    val store = new OffsetStore(tmpDir("inc_store"))
    Seq(("2024-01", 1L), ("2024-01", 2L), ("2024-02", 3L))
      .toDF("month", "v")
      .write.partitionBy("month").mode("append").parquet(dir)

    val first = IncrementalBatch.plan(spark, store, "job1", dir, "month", enc)
    assert(first.df.count() === 3)
    assert(first.latest === Some(202402L))

    // an uncommitted increment replays in full (at-least-once, never skip)
    val replay = IncrementalBatch.plan(spark, store, "job1", dir, "month", enc)
    assert(replay.df.count() === 3)

    first.commit()
    // nothing new → empty increment, no mark movement
    val idle = IncrementalBatch.plan(spark, store, "job1", dir, "month", enc)
    assert(idle.isEmpty && idle.df.count() === 0)
    idle.commit() // must be a no-op
    assert(store.loadOffset("job1", "hwm") === 202402L)

    // a late-arriving new partition is picked up alone
    Seq(("2024-03", 4L)).toDF("month", "v")
      .write.partitionBy("month").mode("append").parquet(dir)
    val next = IncrementalBatch.plan(spark, store, "job1", dir, "month", enc)
    assert(next.df.select($"v").as[Long].collect().toSeq === Seq(4L))
    next.commit()
    assert(store.loadOffset("job1", "hwm") === 202403L)
  }

  test("the increment filter prunes old partitions at the scan") {
    val dir = tmpDir("inc_prune")
    val store = new OffsetStore(tmpDir("inc_store2"))
    Seq(("2024-01", 1L), ("2024-02", 2L), ("2024-03", 3L))
      .toDF("month", "v")
      .write.partitionBy("month").mode("append").parquet(dir)
    store.saveOffset("job2", "hwm", 202402L)
    val inc = IncrementalBatch.plan(spark, store, "job2", dir, "month", enc)
    val scan = inc.df.queryExecution.executedPlan.toString
    // the partition filter reached the file scan (directory-level pruning)
    assert(scan.contains("PartitionFilters:") && scan.contains("month"), scan)
    assert(inc.df.select($"month").distinct().as[String].collect().toSeq
             === Seq("2024-03"))
  }
}
