package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet timestamp[ns], which Spark 4 refuses to read
      // as a timestamp; read it as a raw nanosecond long instead
      // (Tables.events re-derives a µs timestamp column). SURVEY.md §7 risk 1.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the 128-wide MinHash signature aggregate exceeds the default
      // whole-stage-codegen field limit (100) — raise it so wide
      // aggregates stay codegen'd (graft.ops.llm.Dedup).
      .config("spark.sql.codegen.maxFields", "220")
      .getOrCreate()
    // SPARK_GRAFT_MATERIALIZE=reliable runs the whole sweep with
    // checkpoint() materialization (the 100 TB executor-loss-safe
    // mode) instead of localCheckpoint — the VERDICT r9 #2 fleet
    // exercise. Set ONLY when the env var is present: since r17 an
    // EXPLICIT local vetoes the loop-pin autopilot (VERDICT r16 #2),
    // so unconditionally writing "local" here would change loopMode's
    // semantics for the sweep instead of leaving the default.
    sys.env.get("SPARK_GRAFT_MATERIALIZE")
      .foreach(m => spark.conf.set(graft.state.Materialize.ModeKey, m))
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Local-dev focus filter (same contract as SPARK_GRAFT_BENCH_ONLY):
    // comma-list of query names. Unset for the driver → full dump.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String) = only.forall(_.contains(name))
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      // Same per-query debris sweep as Bench: with stage-boundary pins in
      // the query paths (r17), a full 252-query dump would otherwise
      // accumulate every query's localCheckpoint blocks for the whole
      // sweep. Session-lived memoized pins (SuffixIndex) are retained —
      // unpersisting a lineage-truncated frame breaks later consumers.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => graft.state.Materialize.isRetained(id) }
        .values.foreach(_.unpersist(blocking = false))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
