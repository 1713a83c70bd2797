package graft.state

import org.apache.spark.sql.DataFrame

/** Lineage-truncating materialization for iterative / multi-consumer
  * intermediates (winnow fingerprints, connected-components rounds,
  * suffix-array rounds, TextRank iterations).
  *
  * `localCheckpoint()` is the right default on a single node: eager, no
  * external storage, truncates lineage so AQE re-plans from observed
  * sizes. Its cost at cluster scale is that it pins the data to EXECUTOR
  * block storage — a corpus-sized intermediate occupies executor
  * memory/disk for the query's lifetime and is lost (query fails) on
  * executor decommission, which at 100 TB / 1000 executors is a
  * when-not-if event. `spark.graft.materialize=reliable` switches every
  * such site to `checkpoint()` against the configured
  * `spark.checkpoint.dir` (HDFS/object store on a real cluster), which
  * survives executor loss and frees block storage at the cost of one
  * write+read round trip.
  *
  * Mode is read per-call from the session conf, so one session can flip
  * it between queries:
  *   - `local` (default) — `df.localCheckpoint()` (eager)
  *   - `reliable`        — `df.checkpoint()` (eager). If no checkpoint
  *     dir is set: on a `local`/`local[*]` master a per-JVM temp dir is
  *     installed so tests work out of the box; on any OTHER master the
  *     call fails fast — a driver-local temp dir would have every
  *     executor write checkpoint blocks to its own non-shared disk,
  *     silently defeating the executor-loss-survival purpose the mode
  *     exists for. A real deployment sets `spark.checkpoint.dir` to
  *     shared reliable storage (HDFS / object store) explicitly.
  */
object Materialize {

  val ModeKey = "spark.graft.materialize"

  /** RDD ids pinned on behalf of a SESSION-LIVED cache (the memoized
    * [[graft.ops.llm.SuffixIndex]]): Bench's per-query debris sweep
    * unpersists every persistent RDD between queries, which would
    * destroy a lineage-truncated (localCheckpoint) cached frame — the
    * cache would then hand later queries dataframes whose blocks are
    * gone. The sweep consults this set and leaves retained ids alone.
    */
  private val retained =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  def isRetained(rddId: Int): Boolean = retained.contains(rddId)

  /** [[pin]], additionally marking the newly-persisted RDD ids as
    * retained (diffed around the pin — the builds that use this run
    * sequentially per session, which is the only way pins happen).
    */
  def pinRetained(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = pin(df)
    (sc.getPersistentRDDs.keySet -- before).foreach(retained.add(_))
    out
  }

  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.get(ModeKey, "local") match {
      case "local" => df.localCheckpoint()
      case "reliable" =>
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          if (!sc.isLocal) throw new IllegalStateException(
            s"$ModeKey=reliable on master '${sc.master}' requires " +
            "spark.checkpoint.dir set to SHARED reliable storage " +
            "(HDFS/object store): a driver-local temp dir would leave " +
            "each executor's checkpoint blocks on its own non-shared " +
            "disk, defeating executor-loss survival.")
          sc.setCheckpointDir(
            java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
        }
        df.checkpoint()
      case other => throw new IllegalArgumentException(
        s"$ModeKey: unknown mode '$other' (supported: local, reliable)")
    }
  }
}
