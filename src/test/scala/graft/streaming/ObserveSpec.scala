package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** `Dataset.observe` — in-plan named metrics (row counts, sums, null
  * tallies collected WHILE the job runs, no second pass): the mechanism
  * a pipeline uses to publish throughput/quality counters without
  * re-scanning. Batch metrics surface through QueryExecutionListener;
  * streaming metrics ride each micro-batch's StreamingQueryProgress.
  */
class ObserveSpec extends SparkSpec {

  import spark.implicits._

  test("batch observe: named metrics arrive via QueryExecutionListener " +
       "with no extra scan") {
    @volatile var seen: Option[org.apache.spark.sql.Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("doc_metrics").foreach(r => seen = Some(r))
      override def onFailure(f: String, qe: QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = graft.Tables.documents(spark, "/root/testdata/sf0.001")
        .observe("doc_metrics",
          count(lit(1)).as("n_docs"),
          sum($"n_chars").as("total_chars"),
          count_if($"n_chars" < 50).as("n_tiny"))
        .filter($"n_chars" >= 0)
      val n = df.count()
      // the listener bus is async — poll briefly
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val m = seen.getOrElse(fail("observed metrics never arrived"))
      assert(m.getAs[Long]("n_docs") === n)
      assert(m.getAs[Long]("total_chars") > 0)
    } finally spark.listenerManager.unregister(listener)
  }

  test("streaming observe: per-micro-batch metrics ride " +
       "StreamingQueryProgress.observedMetrics") {
    val in = MemoryStream[(Long, Long)](spark)
    val q = in.toDF().toDF("k", "v")
      .observe("batch_metrics", count(lit(1)).as("n_rows"),
               sum($"v").as("sum_v"))
      .writeStream.format("noop").start()
    try {
      in.addData((1L, 10L), (2L, 20L), (3L, 12L))
      q.processAllAvailable()
      val metrics = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("batch_metrics")))
      assert(metrics.nonEmpty, "no observed metrics in any progress event")
      assert(metrics.map(_.getAs[Long]("n_rows")).sum === 3L)
      assert(metrics.map(_.getAs[Long]("sum_v")).sum === 42L)
    } finally q.stop()
  }
}
