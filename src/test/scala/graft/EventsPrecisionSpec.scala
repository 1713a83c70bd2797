package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Fixture-schema drift guard for `Tables.events` (VERDICT r6 items 1+2+7).
  *
  * The driver's fixture generator has shipped `events.ts` as parquet
  * `timestamp[ns]` (arrives as a raw ns long under the nanosAsLong session
  * flag) and as `timestamp[us]` (arrives as TIMESTAMP/TIMESTAMP_NTZ). Round
  * 6 lost 40 gates to the silent ns assumption; these tests pin the
  * normalized output contract (`ts` = epoch-ns long, `ts_utc` = µs
  * timestamp) across every physical encoding, prove the ts-consuming query
  * families return identical results under each, and check the fail-fast
  * path for an unknown encoding plus registerViews' per-table isolation.
  */
class EventsPrecisionSpec extends SparkSpec {

  private val srcDir = "/root/testdata/sf0.001"

  /** Copy the sf0.001 fixture dir, then rewrite events.parquet with `ts`
    * re-encoded by SQL expression `encSql` over the normalized epoch-ns
    * long. ns→µs here MUST be integral `div`, not `/` — double division
    * corrupts 2024-era ns values (the exact trap Tables.events documents).
    */
  private def fixtureDir(name: String)(encSql: String): String = {
    val dir = tmpDir(s"events-$name-")
    Files.list(Paths.get(srcDir)).forEach { p =>
      Files.copy(p, Paths.get(dir, p.getFileName.toString),
        StandardCopyOption.REPLACE_EXISTING)
    }
    Tables.events(spark, srcDir)
      .select(col("event_id"), expr(encSql).as("ts"), col("user_id"),
              col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val nsLongDir = fixtureDir("nslong")("ts") // bigint epoch-ns
  private lazy val ltzDir    = fixtureDir("ltz")("timestamp_micros(ts div 1000)")
  private lazy val ntzDir    =
    fixtureDir("ntz")("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("normalized contract is identical across ns-long, timestamp, and timestamp_ntz encodings") {
    val variants = Map("us-fixture" -> srcDir, "ns-long" -> nsLongDir,
                       "ltz" -> ltzDir, "ntz" -> ntzDir)
    val frames = variants.map { case (n, d) => n -> Tables.events(spark, d) }
    frames.foreach { case (n, df) =>
      assert(df.schema("ts").dataType == LongType, s"$n: ts must be epoch-ns long")
      assert(df.schema("ts_utc").dataType == TimestampType, s"$n: ts_utc must be timestamp")
      assert(df.schema.fieldNames.toSeq ==
        Seq("event_id", "ts", "user_id", "event_type", "value", "props", "ts_utc"),
        s"$n: column order drifted")
    }
    val baseline = canon(frames("us-fixture"))
    assert(baseline.nonEmpty)
    frames.foreach { case (n, df) =>
      assert(canon(df) == baseline, s"$n rows differ from the µs fixture")
    }
  }

  test("ts-consuming query families match across physical encodings") {
    // One representative per broken-in-r6 family: keyed, time-series, as-of
    // join, value windows, arg-max agg, tz scalars, skew agg, sql-surface.
    val family = Seq("keyed_latest_per_key", "ts_ohlc", "join_asof",
                     "win_lag_lead", "agg_arg_max_min", "scalar_timezone",
                     "skew_salted_agg", "sql_pivot")
    val qs = SparkEntry.queries
    family.foreach { name =>
      val fn = qs(name)
      val expected = canon(fn(spark, srcDir))
      assert(expected.nonEmpty, s"$name: empty result on the µs fixture")
      assert(canon(fn(spark, nsLongDir)) == expected, s"$name: ns-long drifts")
      assert(canon(fn(spark, ltzDir)) == expected, s"$name: ltz drifts")
    }
  }

  test("µs fixtures need no nanosAsLong legacy flag (VERDICT r6 item 6)") {
    // the flag exists for ns-encoded fixtures only; the engine must not
    // depend on it for µs data — the legacy conf may vanish in a future
    // Spark, and the fixture generator currently emits timestamp[us]
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      assert(canon(Tables.events(spark, srcDir)).nonEmpty)
      assert(SparkEntry.queries("ts_ohlc")(spark, srcDir).collect().nonEmpty)
    } finally spark.conf.set(key, prev)
  }

  test("an unknown ts encoding fails fast naming the found dtype") {
    val dir = fixtureDir("drift")("cast(ts as string)")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events.ts"))
    assert(e.getMessage.contains("string"))
    assert(e.getMessage.contains("supported"))
  }

  test("registerViews isolates a broken events fixture: sql_pivot stays green") {
    val dir = fixtureDir("broken")("cast(ts as string)")
    Tables.registerViews(spark, dir) // must not throw
    val rows = SparkEntry.queries("sql_pivot")(spark, dir).collect()
    assert(rows.nonEmpty)
    // the broken table itself still fails, at its own query, actionably
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("events.ts"))
  }
}
