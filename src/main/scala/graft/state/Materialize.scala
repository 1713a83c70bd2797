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
/** Concurrent running-max gauge (−1 until the first sample) for the
  * cold-build telemetry Bench publishes (`suffix_index_cold_s`,
  * `span_frame_cold_s`). The former `@volatile var x = math.max(x, v)`
  * pattern was a non-atomic read-modify-write: two sessions racing
  * distinct cache keys could lose the LARGER cold-build time — exactly
  * the number the field exists to report.
  */
final class MaxGauge {
  private val bits = new java.util.concurrent.atomic.AtomicLong(
    java.lang.Double.doubleToLongBits(-1.0))
  @annotation.tailrec
  final def sample(v: Double): Unit = {
    val cur = bits.get()
    if (v > java.lang.Double.longBitsToDouble(cur) &&
        !bits.compareAndSet(cur, java.lang.Double.doubleToLongBits(v)))
      sample(v)
  }
  def get: Double = java.lang.Double.longBitsToDouble(bits.get())
}

object Materialize {

  val ModeKey = "spark.graft.materialize"

  /** RDD ids pinned on behalf of a SESSION-LIVED cache (the memoized
    * [[graft.ops.llm.SuffixIndex]]): Bench's per-query debris sweep
    * unpersists every persistent RDD between queries, which would
    * destroy a lineage-truncated (localCheckpoint) cached frame — the
    * cache would then hand later queries dataframes whose blocks are
    * gone. The sweep consults this set and leaves retained ids alone.
    */
  private val retained = new java.util.concurrent.ConcurrentHashMap[
    Int, org.apache.spark.SparkContext]()

  /** Ids are attributed to their owning context: RDD ids restart at 0 per
    * SparkContext, so a stale id surviving a context stop would exempt an
    * UNRELATED later pin from the sweep. Entries of stopped contexts are
    * purged on lookup (ADVICE r9).
    */
  def isRetained(rddId: Int): Boolean = retained.get(rddId) match {
    case null => false
    case sc if sc.isStopped => retained.remove(rddId); false
    case _ => true
  }

  private val retainLock = new Object

  /** [[pin]], additionally marking the newly-persisted RDD ids as
    * retained. The ids are diffed around the pin; the lock confines the
    * diff window so a concurrent `pinRetained` (e.g. parallel suites on a
    * shared context) cannot have its ids attributed here (ADVICE r9). A
    * concurrent plain [[pin]] inside the window is still possible and at
    * worst exempts one sweepable pin from one sweep — stopped-context
    * entries are purged on lookup either way.
    */
  def pinRetained(df: DataFrame): DataFrame = retainLock.synchronized {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = pin(df)
    (sc.getPersistentRDDs.keySet -- before).foreach(retained.put(_, sc))
    out
  }

  /** Drop entries of a (SparkSession, …)-keyed session cache whose
    * session's context has stopped — the cached frames' blocks died with
    * the context, so handing them out would serve dead blocks, and the
    * entries otherwise leak for the JVM's lifetime (ADVICE r9). Call
    * before every cache lookup; CHM iterators support concurrent removal.
    */
  def purgeStopped[K, V](cache: java.util.concurrent.ConcurrentHashMap[K, V])(
      session: K => org.apache.spark.sql.SparkSession): Unit = {
    val it = cache.keySet.iterator
    while (it.hasNext) if (session(it.next()).sparkContext.isStopped) it.remove()
  }

  /** Clear callbacks of the session-lived memo caches (SuffixIndex
    * `forDir`/`forFrame`, Dedup's span/pair caches, TextStats' winnow
    * cache). Each cache registers once at object init; tests that must
    * observe a cache MISS — the unknown-mode dispatch error, a real
    * reliable-vs-local re-derivation — reset the whole memo layer here
    * instead of reaching into private maps.
    */
  private val sessionCaches =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  private[graft] def registerSessionCache(clear: () => Unit): Unit =
    sessionCaches.add(clear)

  /** Reset every registered memo cache AND un-strand their pins. The
    * cleared entries' retained RDD ids would otherwise stay exempt from
    * the debris sweep forever (the sweep skips retained ids BY DESIGN),
    * so each clear + re-derivation cycle would strictly grow executor
    * block storage until the context stops. The caches just dropped
    * their only handles, so the pins are unpersisted and un-retained
    * here; a frame a caller captured BEFORE the clear is invalidated
    * (lineage-truncated, blocks gone) — acceptable for this test-only
    * reset API, and documented so nobody promotes it to a public
    * surface without revisiting that contract.
    */
  private[graft] def clearSessionCaches(): Unit = {
    // Snapshot the retained ids BEFORE the cache clears, and sweep only
    // the snapshot: ids a racing pinRetained registers during/after the
    // clears are never swept, so a computeIfAbsent entry installing
    // mid-reset keeps live pins (if its entry got cleared instead, the
    // orphaned pins are collected by the NEXT reset — a one-cycle leak,
    // not a poison). Deliberately NOT serialized with retainLock: the
    // cache clears contend on computeIfAbsent bin locks whose mapping
    // functions take retainLock inside pinRetained — holding it here
    // would deadlock. Residual (documented) window: a mapping that
    // finished its pinRetained before the snapshot but installs its
    // entry after that cache's clear serves swept blocks — impossible
    // in this private API's sequential test usage, and the reason it
    // must not be promoted to a public surface as-is.
    val snapshot = {
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(Int, org.apache.spark.SparkContext)]
      val it = retained.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf
    }
    sessionCaches.forEach(_.apply())
    snapshot.foreach { case (id, sc) =>
      if (!sc.isStopped)
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
      retained.remove(id)
    }
  }

  /** [[pin]] plus a targeted RELEASE handle, for pins scoped to one
    * eager computation (self-review r13 pass 5: a caller-side
    * `getPersistentRDDs` keyset diff races every concurrent pin in the
    * session and would unpersist a foreign lineage-truncated frame —
    * dead blocks, the exact failure the retained-pin machinery
    * prevents). The release walks the pinned frame's OWN lineage only:
    * it unpersists the first persisted ancestors (the localCheckpoint
    * blocks) and, in reliable mode, deletes the checkpoint FILES —
    * ContextCleaner does not (`cleanCheckpoints` defaults false), so a
    * per-micro-batch caller would otherwise grow shared storage without
    * bound. Caller contract: release ONLY after every consumer of the
    * pinned frame has fully materialized (a released localCheckpoint
    * cannot recompute); safe in a `finally` — failures between pin and
    * release must not leak a corpus-sized pin per retry.
    */
  def pinScoped(df: DataFrame): (DataFrame, () => Unit) = {
    val pinned = pin(df)
    (pinned, () => releasePinned(pinned))
  }

  /** The release half of [[pinScoped]], callable directly on a frame
    * produced by [[pin]] whose every consumer has fully materialized:
    * walks the frame's OWN lineage to its first persisted ancestors,
    * unpersists them, and in reliable mode deletes their checkpoint
    * FILES. Exposed separately (round 14) so iterative builders like
    * `starComponents` can free SUPERSEDED round pins as soon as the
    * next round is pinned — without it, a foreach_batch caller under
    * `materialize=reliable` accrues one set of round-pin files per
    * micro-batch that ContextCleaner never deletes.
    */
  def releasePinned(df: DataFrame): Unit = {
    val sc = df.sparkSession.sparkContext
    def walk(r: org.apache.spark.rdd.RDD[_]): Unit = {
      val persisted =
        r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
      if (persisted) r.unpersist(blocking = false)
      val ckpt = r.getCheckpointFile
      ckpt.foreach { p =>
        // NonFatal only, and LOUD on failure: a silent swallow here
        // re-opens the unbounded checkpoint-file growth this release
        // exists to close (a permissions change on the object store
        // would otherwise "succeed" every batch while deleting
        // nothing), and eating an InterruptedException would lose the
        // thread's cancellation (self-review r13 pass 6)
        try {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(sc.hadoopConfiguration).delete(hp, true)
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(
            s"[materialize] pin release failed to delete " +
            s"checkpoint files at $p: $e — files LEAK until cleaned")
        }
      }
      if (!persisted && ckpt.isEmpty)
        r.dependencies.foreach(d => walk(d.rdd))
    }
    if (!sc.isStopped) walk(df.rdd)
  }

  def pin(df: DataFrame): DataFrame =
    pinWith(df, df.sparkSession.conf.get(ModeKey, "local"))

  /** Size threshold (bytes) for [[pinIfLarge]] — the conditional-pin
    * gate for sub-corpus multi-consumer towers (r18, VERDICT r17 #3).
    * Default 64 MiB of OPTIMIZER-ESTIMATED frame bytes: the r17 wave
    * pinned every multi-consumer tower unconditionally, which bought
    * the at-scale pass reduction but charged each sub-second gate a
    * ~0.2–0.3 s materialization barrier at sf0.1 (the documented
    * "local pin cost" rows: NBC ×4, kmeans ×2, heavy_hitters,
    * freq_items, rrf, lsh). Estimates for these towers sit in the
    * KB–MB range on the test fixtures and in the TB range on a real
    * corpus, so one threshold cleanly separates the regimes. ≤ 0
    * disables the gate (always pin).
    */
  val AdaptivePinBytesKey = "spark.graft.pin.minBytes"
  val AdaptivePinBytesDefault: Long = 64L << 20

  /** [[pin]] iff Catalyst's size estimate for `df` crosses
    * [[AdaptivePinBytesKey]]; otherwise returns `df` unchanged, so each
    * consumer re-derives the (tiny) tower — cheaper than a pin barrier
    * below the threshold, result-identical always (the towers are
    * deterministic). Estimate-based, not measured: measuring requires
    * materializing, which IS the cost being avoided; a wrong estimate
    * can only cost performance (an over-estimate keeps the r17 pin —
    * the status quo; an under-estimate re-derives per consumer), never
    * correctness. Use for multi-consumer towers whose pin exists for
    * CORPUS-scale pass reduction; iterative loop pins (2^T blowup
    * without lineage truncation) must stay unconditional.
    */
  def pinIfLarge(df: DataFrame): DataFrame = {
    val thrRaw = df.sparkSession.conf
      .get(AdaptivePinBytesKey, AdaptivePinBytesDefault.toString)
    val thr = try thrRaw.trim.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$AdaptivePinBytesKey: expected a byte count (long, e.g. " +
        s"67108864; <= 0 pins unconditionally), got '$thrRaw'")
    }
    if (thr <= 0 ||
        df.queryExecution.optimizedPlan.stats.sizeInBytes >= BigInt(thr))
      pin(df)
    else df
  }

  /** [[pin]] with the mode decided by the CALLER instead of the session
    * conf — the per-operator escape hatch for iterative loops
    * (VERDICT r15 #3): one query can pin its loop-resident frames as
    * reliable checkpoint files while the rest of the session keeps the
    * local default, without flipping a session-global conf mid-query
    * (which would race concurrent queries on the same session). The
    * two modes produce bit-identical frames (both are eager
    * materializations of the same plan — law-tested in GraphSpec), so
    * mixing them within one query is sound.
    */
  def pinWith(df: DataFrame, mode: String): DataFrame = {
    val spark = df.sparkSession
    mode match {
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

  /** ACTUAL resident bytes (memory + disk blocks) of a pinned frame:
    * walks the frame's own lineage to its first persisted ancestors
    * (exactly like [[releasePinned]]) and sums their block storage from
    * the context's storage listing. 0 for a reliable (checkpoint-file)
    * pin — its data lives in files, not block storage, which is the
    * point. Measured, not estimated: row-width guesses drift with
    * schema and encoding; the blocks a localCheckpoint just wrote are
    * the exact quantity the single-JVM GC cliff is driven by.
    */
  def pinnedBytes(df: DataFrame): Long = {
    val sc = df.sparkSession.sparkContext
    if (sc.isStopped) return 0L
    val ids = scala.collection.mutable.Set.empty[Int]
    def walk(r: org.apache.spark.rdd.RDD[_]): Unit = {
      val persisted =
        r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
      if (persisted) ids += r.id
      else if (r.getCheckpointFile.isEmpty)
        r.dependencies.foreach(d => walk(d.rdd))
    }
    walk(df.rdd)
    sc.getRDDStorageInfo.iterator
      .filter(info => ids.contains(info.id))
      .map(info => info.memSize + info.diskSize).sum
  }

  /** Threshold (bytes) above which an iterative loop's resident pins
    * auto-upgrade from local blocks to reliable checkpoint files — see
    * [[loopMode]]. Default 256 MiB of measured first-pin bytes: far
    * above any bench-gate graph (the sf0.1 co-occurrence edge pin is
    * ~10–20 MB) and far below the r15-measured single-JVM GC cliff
    * (the 64-replica PageRank edge pin, where local pins stalled
    * 153–680 s vs 95–97 s with reliable pins —
    * docs/cluster-posture.md). ≤ 0 disables the auto choice.
    */
  val AutoReliableBytesKey = "spark.graft.iterative.reliablePinBytes"
  val AutoReliableBytesEnv = "SPARK_GRAFT_ITER_RELIABLE_BYTES"
  val AutoReliableBytesDefault: Long = 256L << 20

  /** Pin mode for an iterative loop's RESIDENT frames, chosen from the
    * loop's FIRST materialized pin (VERDICT r15 #3): r15 measured
    * `materialize=reliable` — the documented cluster mode — as the
    * FASTER shape once resident pinned state passes the single-JVM GC
    * cliff, but the mode was only reachable as a global deployment
    * flag. This gives every loop a per-operator escape with no env var
    * set: an explicitly configured session mode always wins — including
    * an EXPLICIT `local`, which vetoes the autopilot (set vs unset is
    * distinguished via `getOption`; an operator who sets local to avoid
    * object-store checkpoint writes must get local — VERDICT r16 #2).
    * Only when [[ModeKey]] is UNSET does the autopilot engage: a first
    * pin whose measured block bytes exceed [[AutoReliableBytesKey]]
    * (conf, else [[AutoReliableBytesEnv]], else 256 MiB; ≤ 0 disables)
    * upgrades the loop's remaining pins to reliable checkpoint files.
    * Results are bit-identical across modes (law-tested); only
    * residency changes.
    */
  def loopMode(firstPin: DataFrame): String = {
    val conf = firstPin.sparkSession.conf
    val configured = conf.getOption(ModeKey)
    if (configured.isDefined) configured.get
    else {
      // loud parse (VERDICT r16 #3): a malformed threshold must name
      // the conf key / env var it came from and the expected format,
      // not surface as a bare NumberFormatException mid-query
      val (thrSrc, thrRaw) = conf.getOption(AutoReliableBytesKey)
        .map((AutoReliableBytesKey, _))
        .orElse(sys.env.get(AutoReliableBytesEnv)
          .map((AutoReliableBytesEnv, _)))
        .getOrElse(("default", AutoReliableBytesDefault.toString))
      val thr = try thrRaw.trim.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$thrSrc: expected a byte count (long, e.g. 268435456; <= 0 " +
          s"disables the reliable-pin autopilot), got '$thrRaw'")
      }
      val bytes = if (thr > 0) pinnedBytes(firstPin) else -1L
      if (thr > 0 && bytes >= thr) {
        // the upgrade must never convert a WORKING query into a hard
        // failure: on a non-local master with no checkpoint dir,
        // pinWith(reliable) fails fast by design (a driver-local temp
        // dir would defeat executor-loss survival) — there the
        // autopilot stays local and says why, instead of failing a
        // query that plain local pins would have carried (r16
        // self-review)
        val sc = firstPin.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty && !sc.isLocal) {
          System.err.println(s"[materialize] loop pins NOT upgraded " +
            s"despite first pin $bytes bytes >= threshold $thr: no " +
            "spark.checkpoint.dir on a cluster master — set one " +
            "(shared reliable storage) to enable the faster " +
            "checkpoint-file residency for corpus-scale loops")
          "local"
        } else {
          // loud once per upgrade: the probe/bench reader must be able
          // to tell WHICH residency the loop ran with (the two modes'
          // perf differs exactly in the regime this fires in)
          System.err.println(s"[materialize] loop pins upgraded to " +
            s"reliable: first pin $bytes bytes >= threshold $thr")
          "reliable"
        }
      } else "local"
    }
  }
}
