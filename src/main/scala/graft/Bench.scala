package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType
import java.nio.file.{Files, Paths}

/** Per-round benchmark: times every declared query at the SF the driver
  * points at (sf0.1 by default) and emits one JSON line (stdout + file).
  */
object Bench {

  /** The recorded baseline the ≤2× gate divides by. Bump ONLY when a
    * judge re-records the baseline.
    *
    * Round-10 re-record, judge-authorized (VERDICT r9 #3): the round-5
    * denominator (100.46s / 221 queries) was recorded on ~2× faster
    * iron — proven by r9's controlled A/B (the exact r5 tree rebuilt on
    * today's host reproduces today's times) — so the gate had come to
    * measure the host, not the code. New baseline: the round-10
    * clean-host full sweep, **142.01s over 251 queries at sf0.1,
    * local[32], load_start 0.10** (BENCH_r10 pre-record run; regression
    * guard vs r9 on the 66-query comparable set: 0 broken, 0 regressed
    * ≥1.5×, 5 improved ≥1.5×). The r5 value stays in COVERAGE's
    * baseline history; cross-round ratios before r10 keep their
    * published r5-denominated values.
    */
  private val BaselineSeconds = 142.01
  private val BaselineRound = 10

  /** Force FULL evaluation of every output column. Timing `count()` lets
    * Catalyst prune the projected expressions, so map-only queries (scalar
    * packs, window projections) would never execute the work being timed;
    * hashing every column into an aggregate makes the measured plan the
    * real one. Map-typed columns are serialized first (Spark forbids
    * hashing MapType directly).
    */
  private def force(df: DataFrame): Unit = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: MapType => to_json(col(f.name))
        case _          => col(f.name)
      }
    }
    // bit_xor, not sum: ANSI mode (Spark 4 default) throws on long overflow,
    // and summing 64-bit hashes overflows almost immediately.
    df.select(xxhash64(cols.toSeq: _*).as("h")).agg(bit_xor(col("h"))).collect()
    ()
  }

  /** 1-minute loadavg from /proc — recorded at run start/end so a reader
    * of BENCH.json can tell host contention from a genuine regression
    * without re-running (VERDICT r4 #2: a 78× per-query anomaly was only
    * diagnosable by reproduction because run conditions weren't logged).
    */
  private def loadAvg(): Double =
    try Files.readString(Paths.get("/proc/loadavg")).split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** MemAvailable from /proc/meminfo, in MiB (-1 if unreadable). */
  private def memAvailMb(): Long =
    try {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(Paths.get("/proc/meminfo")).asScala
        .find(_.startsWith("MemAvailable:"))
        .map(_.split("\\s+")(1).toLong / 1024)
        .getOrElse(-1L)
    } catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (load0, mem0) = (loadAvg(), memAvailMb())
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // wide MinHash signature aggregate: keep whole-stage codegen on
      // past the default 100-field limit (graft.ops.llm.Dedup).
      .config("spark.sql.codegen.maxFields", "220")
      // the session-lived memoized pins (suffix index, span/winnow
      // frames) stay resident for ~150 queries of the sweep; the
      // protected-storage floor decides whether they squeeze execution
      // memory (default 0.5) or spill to disk under pressure
      // (MEMORY_AND_DISK localCheckpoint blocks are eviction-safe).
      // Exposed for A/B: SPARK_GRAFT_STORAGE_FRACTION.
      .config("spark.memory.storageFraction",
        sys.env.getOrElse("SPARK_GRAFT_STORAGE_FRACTION", "0.5"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: run the flagship once so the first timed query doesn't absorb
    // JVM/codegen/parquet-reader initialization (VERDICT r1 noted the first
    // query's time was mostly warmup).
    try force(SparkEntry.queries("q1_pricing_summary")(spark, sfDir))
    catch { case _: Throwable => () }
    // Median of n≥3 reps per query (VERDICT r2 #4: single-shot times swung
    // up to 2.7× run-to-run from JVM/cleanup interference). Rep 1 also
    // absorbs any one-time per-query setup (codegen compile, fixture
    // render) that the median then excludes.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // Optional comma-separated query filter for focused tuning runs.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = selected.map { case (name, fn) =>
      // Per-query debris sweep (VERDICT r4 #2): 191 queries in one JVM
      // accumulate cached plans, localCheckpoint RDD blocks, and pending
      // broadcasts; late-alphabet queries otherwise inherit 150 queries
      // of storage-memory pressure (the mechanism behind the r4
      // llm_winnow_pairs 78× official-vs-isolated anomaly).
      spark.catalog.clearCache()
      // ... but never the session-lived cache pins (SuffixIndex): those
      // are lineage-truncated, so unpersisting them doesn't free-and-
      // recompute, it BREAKS every later query holding the cached frame.
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => graft.state.Materialize.isRetained(id) }
        .values.foreach(_.unpersist(blocking = false))
      val times = (1 to reps).flatMap { _ =>
        // Drain the async cleanup backlog (shuffle files, broadcasts) from
        // prior queries before timing: 60 queries in one JVM otherwise
        // interfere — measured up to 5× phantom slowdowns on late queries.
        System.gc()
        Thread.sleep(100)
        val t0 = System.nanoTime()
        try { force(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      val med =
        if (times.isEmpty) -1.0
        else {
          val s = times.sorted
          // true median: average the two middles on an even sample count
          // (lower-middle alone would report the MINIMUM for n = 2)
          if (s.size % 2 == 1) s(s.size / 2)
          else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
        }
      name -> med
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val (load1, mem1) = (loadAvg(), memAvailMb())
    // Self-annotate contention (VERDICT r10 #6): snapshots are only
    // comparable below load 1.5 (the repo's own bar, memory + COVERAGE);
    // a loaded driver run previously produced two phantom >=1.5x
    // "regressions" a reader had to debunk by hand. Flag it in the
    // artifact so downstream tooling (and the regress guard below) can
    // mark the run suspect instead of crying wolf.
    // load_start >= 1.5: the host was busy before we began. load_end >=
    // 4.5: something ELSE ramped up mid-run — the bench's own tail
    // measures 1.8-4.1 on clean runs (4.1 on the FASTEST run of round
    // 11, which an earlier 4.0 threshold false-positived), while the
    // two observed mid-run contaminations (189.9s and 174.5s totals
    // with 2-3x inflated suffix gates) both ended at load >= 5.4 from
    // hypervisor steal bursts this guest cannot see coming — 4.5
    // splits the two observed distributions.
    val contended = load0 >= 1.5 || load1 >= 4.5
    val env = s""""env":{"load_start":$load0,"load_end":$load1,"contended":$contended,"reps":$reps,""" +
      s""""mem_avail_start_mb":$mem0,"mem_avail_end_mb":$mem1,""" +
      // the one-time cold SuffixIndex build the medians exclude (rep 1
      // absorbs it) — published in the artifact so the accounting is
      // machine-readable (−1 when no suffix gate ran this sweep)
      s""""suffix_index_cold_s":${graft.ops.llm.SuffixIndex.lastBuildSeconds},""" +
      // same accounting for the r11 memoized span frame shared by the
      // two substring gates
      s""""span_frame_cold_s":${graft.ops.llm.Dedup.spanFrameColdSeconds}},""" +
      // the ≤2× perf gate's denominator, pinned IN the artifact so a
      // loaded-host run overwriting BENCH.json can't silently shift it:
      // the recorded round-5 full-sweep snapshot (221 queries, sf0.1,
      // load_start 2.01). Compare like-for-like on the queries both
      // rounds declare; r6's 177.67s contaminated snapshot is NOT the
      // baseline (ADVICE r7).
      s""""baseline_s":$BaselineSeconds,"baseline_round":$BaselineRound"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec",$env,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Also persist to a file: the driver's stdout scrape of sbt output is
    // fragile (BENCH_r01.json recorded parsed:null). NEVER on a filtered
    // run — a SPARK_GRAFT_BENCH_ONLY tuning run would otherwise clobber
    // the full round snapshot with a partial one.
    if (only.isEmpty) {
      try Files.writeString(Paths.get("BENCH.json"), line + "\n")
      catch { case _: Throwable => () }
      // automatic per-query regression guard vs the latest committed
      // BENCH_r{N}.json (VERDICT r9 #8: run it in the round flow, not by
      // hand) — writes BENCH_REGRESS.md and prints one loud line
      try regressGuard(results.toMap, contended,
        if (load0 >= 1.5) f"load_start $load0%.2f >= 1.5"
        else f"load_end $load1%.2f >= 4.5")
      catch { case e: Throwable =>
        System.err.println(s"[bench-regress] guard failed: ${e.getMessage}")
      }
    }
    // The driver captures only the LAST 2000 chars of output and parses the
    // JSON out of that window; every round so far recorded parsed:null
    // because (a) sbt's logger prefixed the line with "[info] " (fixed via
    // run/outputStrategy := StdoutOutput in build.sbt) and (b) at 79+
    // queries the full-precision line outgrew the window. So finish with a
    // compact twin — same schema, 2-decimal values — sized to fit the
    // window with the trailing "[success] ..." sbt line accounted for.
    // Slowest queries are kept first if the full map still doesn't fit.
    println(compactLine(results, total, sfDir, env = env))
    spark.stop()
  }

  /** Compare this run's medians against the newest committed
    * `BENCH_r{N}.json` (factor-1.5 alarm, mirroring
    * `tools/bench_regress.py`), write the `BENCH_REGRESS.md` artifact,
    * and print a one-line verdict. Broken = ran before, failed now;
    * regressed = ≥1.5× slower on the comparable set.
    */
  private def regressGuard(current: Map[String, Double], contended: Boolean,
                           contendReason: String): Unit = {
    val dir = Paths.get(".")
    val pat = raw"BENCH_r(\d+)\.json".r
    var best: Option[(Int, java.nio.file.Path)] = None
    import scala.jdk.CollectionConverters._
    // close the directory stream (ADVICE r10: Files.list leaks the fd
    // when only its iterator is consumed)
    val listing = java.nio.file.Files.list(dir)
    try listing.iterator().asScala.foreach { p =>
      p.getFileName.toString match {
        case pat(n) if best.forall(_._1 < n.toInt) => best = Some((n.toInt, p))
        case _ => ()
      }
    } finally listing.close()
    best.foreach { case (round, path) =>
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = mapper.readTree(Files.readString(path))
      // the driver's BENCH_r{N}.json wraps the bench line under
      // "parsed"; when its stdout scrape failed, "parsed" is null and
      // "tail" holds a (possibly truncated) fragment — recover pairs by
      // regex, mirroring tools/bench_regress.py
      val old: Map[String, Double] = {
        val parsed = node.get("parsed")
        val direct = node.get("queries")
        val qs =
          if (parsed != null && parsed.isObject) parsed.get("queries")
          else direct
        if (qs != null && qs.isObject)
          qs.fieldNames().asScala.map(k => k -> qs.get(k).asDouble()).toMap
        else {
          val tail = Option(node.get("tail")).map(_.asText("")).getOrElse("")
          // the tail is the LAST 2000 chars of the driver's stdout scrape:
          // its start boundary can cut a pair mid-token, so require each
          // match to sit between JSON delimiters — a leading `{`/`,` proves
          // the key wasn't truncated, a trailing `,`/`}` proves the number
          // wasn't (ADVICE r10: a boundary fragment yielded a wrong old
          // time and a spurious >=1.5x verdict)
          raw"""[,{]"([A-Za-z0-9_]+)":(-?\d+\.\d+)(?=[,}])""".r
            .findAllMatchIn(tail)
            .map(m => m.group(1) -> m.group(2).toDouble)
            .filterNot(m => Set("value", "load_start", "load_end",
              "baseline_s", "suffix_index_cold_s", "span_frame_cold_s")
              .contains(m._1)).toMap
        }
      }
      val shared = old.keySet.intersect(current.keySet)
        .filter(k => old(k) > 0 && current(k) >= 0)
      val broken = old.keySet.intersect(current.keySet)
        .filter(k => old(k) > 0 && current(k) < 0).toSeq.sorted
      val regressed = shared.filter(k => current(k) / old(k) >= 1.5)
        .toSeq.sortBy(k => -current(k) / old(k))
      val improved = shared.filter(k => old(k) / current(k) >= 1.5)
        .toSeq.sortBy(k => -old(k) / current(k))
      def row(k: String) = f"| $k | ${old(k)}%.2f | ${current(k)}%.2f | ${current(k) / old(k)}%.2fx |"
      val md = new StringBuilder
      val suspect = if (contended) " — CONTENDED HOST" else ""
      md ++= s"# BENCH_REGRESS — this run vs BENCH_r$round.json (factor 1.5)$suspect\n\n"
      if (contended)
        // name the ACTUAL trigger: a load_end-triggered flag previously
        // printed the load_start explanation, sending a reader to debunk
        // the wrong condition
        md ++= f"**CONTENDED RUN ($contendReason)**: times are " +
          "not comparable to a clean-host snapshot; any 'regressed' rows below " +
          "are SUSPECT-HOST, not code verdicts (VERDICT r10 #6 — a load-1.74 " +
          "driver run flagged two phantom regressions the clean run contradicted).\n\n"
      md ++= s"Comparable queries: ${shared.size}; broken: ${broken.size}; "
      md ++= s"regressed >=1.5x: ${regressed.size}; improved >=1.5x: ${improved.size}.\n\n"
      if (broken.nonEmpty)
        md ++= broken.mkString("Broken (ran before, failed now): ", ", ", "\n\n")
      if (regressed.nonEmpty) {
        val head = if (contended) "regressed (suspect-host)" else "regressed"
        md ++= s"| $head | old s | new s | factor |\n|---|---|---|---|\n"
        regressed.foreach(k => md ++= row(k) + "\n")
        md ++= "\n"
      }
      if (improved.nonEmpty) {
        md ++= "| improved | old s | new s | factor |\n|---|---|---|---|\n"
        improved.foreach(k => md ++= row(k) + "\n")
      }
      Files.writeString(Paths.get("BENCH_REGRESS.md"), md.toString)
      val flag = if (contended) " [CONTENDED: regressions suspect-host]" else ""
      println(s"[bench-regress] vs r$round: ${shared.size} comparable, " +
        s"${broken.size} broken, ${regressed.size} regressed >=1.5x, " +
        s"${improved.size} improved >=1.5x -> BENCH_REGRESS.md$flag")
    }
  }

  /** Render the results as a JSON line guaranteed ≤ `budget` chars. */
  private[graft] def compactLine(results: Seq[(String, Double)], total: Double,
                                 sfDir: String, budget: Int = 1800,
                                 env: String = ""): String = {
    def r2(v: Double) = math.round(v * 100) / 100.0
    val sf = raw".*sf([0-9.]+)/?$$".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse(
        // JSON-escape the fallback path: an unescaped quote/backslash
        // would make the line unparseable — the exact failure this
        // function exists to prevent
        "\"" + sfDir.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
    def render(entries: Seq[(String, Double)], omitted: Int): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + r2(v) }
        .mkString("{", ",", "}")
      val omit = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      val envPart = if (env.nonEmpty) env + "," else ""
      s"""{"metric":"total","value":${r2(total)},"unit":"sec",$envPart"queries":$qs$omit,"sf":$sf}"""
    }
    val all = render(results, 0)
    if (all.length <= budget) all
    else {
      // keep the slowest (the ones worth reading in a truncated view);
      // full precision for every query is in BENCH.json regardless
      val bySlow = results.sortBy(-_._2)
      val keep = (results.size to 1 by -1).view
        .map(n => render(bySlow.take(n).sortBy(_._1), results.size - n))
        .find(_.length <= budget)
      keep.getOrElse(render(Seq.empty, results.size))
    }
  }
}
