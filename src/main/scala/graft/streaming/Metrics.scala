package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability: a [[StreamingQueryListener]] that collects
  * per-batch progress (rows read, processing rate, batch duration, state
  * rows) for every query on the session — the operational surface a
  * production pipeline exports to its metrics system. The reference logs
  * lifecycle events through its logger; on Spark the idiomatic form is
  * the listener bus, which sees EVERY query without instrumenting any.
  *
  * Scale note: listeners run on the driver's listener bus and receive
  * one event per micro-batch (not per row), so collection cost is
  * independent of data volume.
  */
object Metrics {

  final case class BatchProgress(
      queryName: String,
      batchId: Long,
      numInputRows: Long,
      processedRowsPerSecond: Double,
      durationMs: Long,
      stateRows: Long)

  /** Attach a fresh collector to the session's stream listener bus.
    * Detach with [[SparkSession]]`.streams.removeListener(collector.listener)`.
    */
  def attach(spark: SparkSession): Collector = {
    val c = new Collector
    spark.streams.addListener(c.listener)
    c
  }

  /** Retention bound: the collector keeps the most recent N batch events
    * (a seconds-granularity trigger left attached for days would
    * otherwise grow driver memory without limit).
    */
  private val MaxRetained = 10000

  final class Collector {
    private val q = new ConcurrentLinkedQueue[BatchProgress]()

    val listener: StreamingQueryListener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val stateRows =
          if (p.stateOperators == null) 0L
          else p.stateOperators.map(_.numRowsTotal).sum
        q.add(BatchProgress(
          Option(p.name).getOrElse(""),
          p.batchId,
          p.numInputRows,
          p.processedRowsPerSecond,
          Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L),
          stateRows))
        while (q.size > MaxRetained) q.poll()
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }

    /** Everything collected so far, in arrival order. */
    def snapshot: Seq[BatchProgress] = q.iterator.asScala.toSeq
  }
}
