package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series operators over the `events` fixture: batch sessionization
  * (the batch twin of the streaming session windows, C28) and
  * resample/gap-fill — the two shapes event analytics always needs.
  *
  * Cross-engine determinism: all timestamps are handled as epoch
  * MICROSECONDS in BIGINT (Spark reads the parquet ns column as a raw
  * long and `div 1000`s it; DuckDB `epoch_ns(ts) // 1000` — identical
  * floor division on non-negative values), so no timestamp/timezone
  * dtype can diverge. Window orders carry `event_id` as the tiebreak so
  * equal timestamps cannot reorder between engines.
  *
  * Scale notes: sessionization is ONE window shuffle on user_id with
  * per-user sorts (bounded by a user's events, never corpus-wide);
  * gap-fill explodes each user's bucket RANGE (bounded by time span, not
  * event count) and joins on the (user, bucket) key — both linear
  * shapes.
  */
object TimeSeries extends QueryPack {

  private val SessionGapUs = 30L * 60 * 1000000 // 30 min
  private val BucketUs     = 3600L * 1000000    // 1 hour

  /** Batch sessionization: a session breaks when the gap to the previous
    * event of the same user exceeds 30 minutes; session id is the
    * running count of breaks (lag + cumulative sum — the classic
    * two-window form).
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", expr("ts div 1000").as("tus"))
    val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
    ev.withColumn("prev", lag($"tus", 1).over(w))
      .withColumn("brk",
        when($"prev".isNull || $"tus" - $"prev" > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
           min($"tus").as("start_us"), max($"tus").as("end_us"))
      .orderBy($"user_id", $"session_id")
  }

  /** Resample + gap-fill: per user, 1-hour buckets from the user's first
    * to last event, with empty buckets filled as zero — the dense series
    * downstream aggregations/charting expect.
    */
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", expr(s"(ts div 1000) div $BucketUs").as("bucket"))
    val counts = ev.groupBy($"user_id", $"bucket").agg(count(lit(1)).as("n"))
    val spans = ev.groupBy($"user_id")
      .agg(min($"bucket").as("b0"), max($"bucket").as("b1"))
    spans.select($"user_id", explode(expr("sequence(b0, b1)")).as("bucket"))
      .join(counts, Seq("user_id", "bucket"), "left_outer")
      .select($"user_id", $"bucket", coalesce($"n", lit(0L)).as("n_events"))
      .orderBy($"user_id", $"bucket")
  }

  /** Sequential funnel analysis: how many users did view → click →
    * purchase IN ORDER — each stage's timestamp must strictly follow the
    * previous stage's first occurrence (the real funnel semantic, not
    * just "did all three ever").
    *
    * Spark-first shape: three chained window aggregates over the SAME
    * partitioning (user_id, no ordering) — Catalyst plans ONE exchange
    * and evaluates the per-user stage minima in sequence without any
    * self-join. The naive form is k-1 self-joins of events to itself
    * (quadratic per hot user); this is one shuffle regardless of funnel
    * depth. Timestamps compare as raw epoch-ns longs — only stage
    * COUNTS are emitted, so no timestamp dtype crosses the gate.
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
    Tables.events(spark, dir)
      .withColumn("tv",
        min(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("tc",
        min(when($"event_type" === "click" && $"ts" > $"tv", $"ts")).over(w))
      .withColumn("tp",
        min(when($"event_type" === "purchase" && $"ts" > $"tc", $"ts")).over(w))
      .groupBy($"user_id")
      .agg(max($"tv").as("tv"), max($"tc").as("tc"), max($"tp").as("tp"))
      .select(count($"tv").as("n1"), count($"tc").as("n2"), count($"tp").as("n3"))
      .selectExpr(
        "stack(3, '1_view', n1, '2_click', n2, '3_purchase', n3) AS (stage, n_users)")
      .orderBy($"stage")
  }

  private val WeekUs = 7L * 86400 * 1000000

  /** Cohort retention: users grouped by their first-activity epoch-week,
    * counted per week-offset of later activity. Two aggregations and one
    * join on user_id — the per-user first-week table is orders of
    * magnitude smaller than the event log, and the final matrix is
    * (cohorts × offsets), tiny at any scale. Pure integer week math.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wk = Tables.events(spark, dir)
      .select($"user_id", expr(s"(ts div 1000) div $WeekUs").as("wk"))
      .distinct()
    val cohort = wk.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
    wk.join(cohort, "user_id")
      .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("offset_wk"))
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_wk", $"offset_wk")
  }

  /** Last-touch attribution: each purchase is credited to the user's most
    * recent preceding click/view. One window shuffle on user_id with a
    * rows-frame `last(..., ignoreNulls)` — never a self-join of the event
    * log to itself. Missing sources surface as -1/'none' (COALESCE keeps
    * every output column non-null so no nullable-int dtype wobble crosses
    * the gate).
    */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
              expr("ts div 1000").as("tus"))
    val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    def src(c: org.apache.spark.sql.Column) =
      last(when($"event_type".isin("click", "view"), c), ignoreNulls = true).over(w)
    e.withColumn("src_id", src($"event_id"))
      .withColumn("src_type", src($"event_type"))
      .withColumn("src_tus", src($"tus"))
      .where($"event_type" === "purchase")
      .select($"event_id", $"user_id",
              coalesce($"src_id", lit(-1L)).as("src_id"),
              coalesce($"src_type", lit("none")).as("src_type"),
              coalesce($"tus" - $"src_tus", lit(-1L)).as("lag_us"))
      .orderBy($"event_id")
  }

  /** Longest consecutive-day activity streak per user — the classic
    * gaps-and-islands shape: distinct active days, `day − row_number`
    * constant within a run, two aggregations. One user_id window shuffle;
    * island keys never leave the user's partition. Pure integer day math.
    */
  def streaks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.events(spark, dir)
      .select($"user_id", expr("(ts div 1000) div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    d.withColumn("g", $"day" - row_number().over(w))
      .groupBy($"user_id", $"g")
      .agg(count(lit(1)).as("len"), min($"day").as("start_day"))
      .groupBy($"user_id")
      .agg(max($"len").as("best_streak"),
           count(lit(1)).as("n_streaks"),
           min($"start_day").as("first_day"))
      .orderBy($"user_id")
  }

  /** Z-score outlier detection per event type: exact-decimal moments
    * (the [[graft.ops.Aggregates.stddevMoments]] technique — values
    * pre-scaled 1/100 so the squared sum's unscaled decimal stays below
    * 2^53; z-scores are scale-invariant so the flagged set is unchanged),
    * broadcast back over the stream for the row-level filter. One
    * aggregate pass + one broadcast join — no window over the full log.
    */
  def anomalies(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"event_id", $"event_type", ($"value" / 100.0).as("v"), $"value")
    val stats = e.groupBy($"event_type")
      .agg(graft.Det.dsum($"v" * $"v").as("sum_sq"),
           graft.Det.dsum($"v").as("sum_x"),
           count($"v").as("n"))
      .select($"event_type",
        ($"sum_x" / $"n").as("mean_v"),
        sqrt(($"sum_sq" - $"sum_x" * $"sum_x" / $"n") / ($"n" - 1)).as("std_v"))
    e.join(broadcast(stats), "event_type")
      .where(abs($"v" - $"mean_v") > $"std_v" * 2.0)
      .select($"event_id", $"event_type", $"value")
      .orderBy($"event_id")
  }

  /** OHLC resampling — the candlestick downsample every metrics store
    * runs: per (event_type, hour bucket) the opening/closing/extreme
    * values plus volume. ONE hash aggregate: open/close are
    * `min_by`/`max_by` over an in-bucket order key (no window, no sort
    * of the full log), high/low are plain min/max — all order-
    * independent, so partial aggregation merges correctly at any
    * partitioning. The order key packs (µs-offset-within-bucket,
    * event_id) into one BIGINT — offset < 3.6e9, ×1e9 + id stays under
    * 2^63 (3.6e18 + id ≪ 9.2e18) — because DuckDB's arg_min/arg_max take
    * a single sort expression; values are picked, never accumulated, so
    * doubles are safe. The packing requires event_id < 10^9 (the id would
    * otherwise bleed into the offset field and open/close would pick the
    * wrong event — invisibly, since the oracle repeats the formula); the
    * bound is asserted against the fixture in TimeSeriesSpec, and 10^9
    * ids per hour bucket is ~280k events/sec of one type — far beyond
    * the per-bucket cardinality this grouping is sane for anyway.
    */
  def ohlc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"event_type", $"event_id", $"value",
              expr("ts div 1000").as("tus"))
      .withColumn("bucket", expr(s"tus div $BucketUs"))
      .withColumn("ok", ($"tus" % BucketUs) * 1000000000L + $"event_id")
    e.groupBy($"event_type", $"bucket")
      .agg(expr("min_by(value, ok)").as("open"),
           max($"value").as("high"),
           min($"value").as("low"),
           expr("max_by(value, ok)").as("close"),
           count(lit(1)).as("volume"))
      .orderBy($"event_type", $"bucket")
  }

  /** Bounded-horizon EWMA (8-tap, α = 1/2) per user — the smoothing pass
    * behind rate limiters and trend features. The exponential tail is
    * truncated at 8 lags so the state is FINITE (a true infinite EWMA is
    * a sequential scan — unbounded state that batch engines cannot merge);
    * weights 2⁷⁻ᵏ and cent-scaled values keep numerator/denominator exact
    * BIGINTs, the single final division is the only float op (bit-identical
    * cross-engine). One window pass on the user_id shuffle; the 8 lag()
    * calls share one frame traversal.
    */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_id", expr("ts div 1000").as("tus"),
              expr("cast(round(value * 100) as bigint)").as("cents"))
    val taps = (0 to 7).map { k =>
      val wt = 1L << (7 - k)
      val l = if (k == 0) $"cents" else lag($"cents", k).over(w)
      (when(l.isNotNull, l * wt).otherwise(0L),
       when(l.isNotNull, lit(wt)).otherwise(0L))
    }
    e.withColumn("num", taps.map(_._1).reduce(_ + _))
      .withColumn("den", taps.map(_._2).reduce(_ + _))
      .select($"user_id", $"event_id", $"num", $"den",
              ($"num".cast("double") / $"den".cast("double")).as("ewma"))
      .orderBy($"user_id", $"event_id")
  }

  /** Batch sessionization via Spark's NATIVE `session_window` — the
    * same 30-minute-gap semantics as [[sessionize]]'s lag+cumsum form
    * but expressed as one aggregate whose grouping key is the merging
    * session window (exactly what the streaming layer runs — C28; the
    * two forms are proven equivalent row-for-row in LawsSpec, and this
    * gate puts the native operator itself under the driver's check).
    * Boundary semantics are pinned, not assumed: an exact-gap pair
    * MERGES under session_window (next event <= current session end
    * extends it — LawsSpec "session_window boundary" proves this on a
    * planted pair), so the oracle's `diff > gap` break condition is the
    * exact spelling of the native operator's boundary on ALL data, not
    * just the µs-random fixture.
    * The window struct is reduced to epoch-µs scalars: `start` equals
    * the session's first event time by construction, and the oracle
    * derives the same sessions with the portable lag+cumsum SQL.
    */
  def sessionNative(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"user_id", $"ts_utc", expr("ts div 1000").as("tus"))
      .groupBy($"user_id", session_window($"ts_utc", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
           min($"tus").as("start_us"), max($"tus").as("end_us"))
      .select($"user_id", unix_micros($"sw.start").as("win_start_us"),
              $"n_events", $"start_us", $"end_us")
      .orderBy($"user_id", $"start_us")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_session_native" -> (sessionNative _),
    "ts_ohlc"        -> (ohlc _),
    "ts_ewma"        -> (ewma _),
    "ts_anomaly"     -> (anomalies _),
    "ts_streaks"     -> (streaks _),
    "ts_retention"   -> (retention _),
    "ts_attribution" -> (attribution _),
    "ts_sessionize" -> (sessionize _),
    "ts_gapfill"    -> (gapFill _),
    "ts_funnel"     -> (funnel _)
  )

  def oracle: Map[String, String] = Map(
    // the portable lag+cumsum spelling of the same 30-min-gap sessions;
    // the native session_window's start IS the first event's time
    "ts_session_native" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, (epoch_ns(ts) // 1000)::BIGINT AS tus
         |  FROM events),
         |a AS (
         |  SELECT user_id, event_id, tus,
         |    CASE WHEN lag(tus) OVER w IS NULL
         |              OR tus - lag(tus) OVER w > $SessionGapUs
         |         THEN 1 ELSE 0 END AS brk
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
         |s AS (
         |  SELECT user_id, tus,
         |    SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |                   ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM a)
         |SELECT user_id, MIN(tus) AS win_start_us, COUNT(*) AS n_events,
         |  MIN(tus) AS start_us, MAX(tus) AS end_us
         |FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin,
    "ts_ohlc" ->
      s"""WITH e AS (
         |  SELECT event_type, event_id, value,
         |    (epoch_ns(ts) // 1000)::BIGINT AS tus
         |  FROM events),
         |b AS (
         |  SELECT event_type, value, tus // $BucketUs AS bucket,
         |    (tus % $BucketUs) * 1000000000 + event_id AS ok
         |  FROM e)
         |SELECT event_type, bucket,
         |  arg_min(value, ok) AS open,
         |  MAX(value) AS high,
         |  MIN(value) AS low,
         |  arg_max(value, ok) AS close,
         |  COUNT(*) AS volume
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ts_ewma" -> {
      val taps = (0 to 7).map { k =>
        val wt = 1L << (7 - k)
        val l = if (k == 0) "cents" else s"lag(cents, $k) OVER w"
        (s"COALESCE($l * $wt, 0)",
         s"CASE WHEN $l IS NOT NULL THEN $wt ELSE 0 END")
      }
      s"""WITH e AS (
         |  SELECT user_id, event_id,
         |    (epoch_ns(ts) // 1000)::BIGINT AS tus,
         |    CAST(round(value * 100) AS BIGINT) AS cents
         |  FROM events),
         |t AS (
         |  SELECT user_id, event_id,
         |    (${taps.map(_._1).mkString(" + ")})::BIGINT AS num,
         |    (${taps.map(_._2).mkString(" + ")})::BIGINT AS den
         |  FROM e
         |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id))
         |SELECT user_id, event_id, num, den,
         |  num::DOUBLE / den::DOUBLE AS ewma
         |FROM t ORDER BY user_id, event_id""".stripMargin
    },
    "ts_anomaly" ->
      s"""WITH e AS (
         |  SELECT event_id, event_type, value / 100.0 AS v, value FROM events),
         |s AS (
         |  SELECT event_type,
         |    ${graft.Det.sqlSum("v * v")} AS sum_sq,
         |    ${graft.Det.sqlSum("v")} AS sum_x,
         |    COUNT(v) AS n
         |  FROM e GROUP BY event_type),
         |st AS (
         |  SELECT event_type, (sum_x / n) AS mean_v,
         |    sqrt((sum_sq - sum_x * sum_x / n) / (n - 1)) AS std_v
         |  FROM s)
         |SELECT event_id, e.event_type, value
         |FROM e JOIN st ON e.event_type = st.event_type
         |WHERE abs(v - mean_v) > std_v * 2.0
         |ORDER BY event_id""".stripMargin,
    "ts_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id,
        |    (((epoch_ns(ts) // 1000)::BIGINT) // 86400000000)::BIGINT AS day
        |  FROM events),
        |r AS (
        |  SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS g
        |  FROM d),
        |runs AS (
        |  SELECT user_id, g, COUNT(*) AS len, MIN(day) AS start_day
        |  FROM r GROUP BY 1, 2)
        |SELECT user_id, MAX(len) AS best_streak, COUNT(*) AS n_streaks,
        |  MIN(start_day) AS first_day
        |FROM runs GROUP BY 1 ORDER BY user_id""".stripMargin,
    "ts_retention" ->
      s"""WITH e AS (
         |  SELECT DISTINCT user_id,
         |    (((epoch_ns(ts) // 1000)::BIGINT) // $WeekUs)::BIGINT AS wk
         |  FROM events),
         |f AS (SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY 1)
         |SELECT f.cohort_wk, (e.wk - f.cohort_wk) AS offset_wk,
         |  COUNT(DISTINCT e.user_id) AS n_users
         |FROM e JOIN f ON e.user_id = f.user_id
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ts_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    (epoch_ns(ts) // 1000)::BIGINT AS tus
        |  FROM events),
        |a AS (
        |  SELECT user_id, event_id, event_type, tus,
        |    last_value(CASE WHEN event_type IN ('click', 'view')
        |               THEN event_id END IGNORE NULLS)
        |      OVER w AS src_id,
        |    last_value(CASE WHEN event_type IN ('click', 'view')
        |               THEN event_type END IGNORE NULLS)
        |      OVER w AS src_type,
        |    last_value(CASE WHEN event_type IN ('click', 'view')
        |               THEN tus END IGNORE NULLS)
        |      OVER w AS src_tus
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id,
        |  COALESCE(src_id, -1) AS src_id,
        |  COALESCE(src_type, 'none') AS src_type,
        |  COALESCE(tus - src_tus, -1) AS lag_us
        |FROM a WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    "ts_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, (epoch_ns(ts) // 1000)::BIGINT AS tus
        |  FROM events
        |),
        |l AS (
        |  SELECT user_id, event_id, tus,
        |    lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev
        |  FROM e
        |),
        |b AS (
        |  SELECT user_id, event_id, tus,
        |    CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM l
        |),
        |s AS (
        |  SELECT user_id, tus,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                   ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
        |  FROM b
        |)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(tus) AS start_us, MAX(tus) AS end_us
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,
    "ts_gapfill" ->
      """WITH e AS (
        |  SELECT user_id, ((epoch_ns(ts) // 1000)::BIGINT // 3600000000)::BIGINT AS bucket
        |  FROM events
        |),
        |c AS (SELECT user_id, bucket, COUNT(*) AS n FROM e GROUP BY 1, 2),
        |sp AS (SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1
        |       FROM e GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket FROM sp)
        |SELECT g.user_id, g.bucket, COALESCE(c.n, 0)::BIGINT AS n_events
        |FROM g LEFT JOIN c ON g.user_id = c.user_id AND g.bucket = c.bucket
        |ORDER BY g.user_id, g.bucket""".stripMargin,
    // staged minima via joins (DuckDB has no chained window deps);
    // ns-timestamp comparisons are order-identical to Spark's raw longs
    "ts_funnel" ->
      """WITH t1 AS (
        |  SELECT user_id,
        |    MIN(ts) FILTER (WHERE event_type = 'view') AS tv
        |  FROM events GROUP BY user_id),
        |t2 AS (
        |  SELECT e.user_id, ANY_VALUE(t1.tv) AS tv,
        |    MIN(e.ts) FILTER (WHERE e.event_type = 'click' AND e.ts > t1.tv) AS tc
        |  FROM events e JOIN t1 USING (user_id) GROUP BY e.user_id),
        |t3 AS (
        |  SELECT e.user_id, ANY_VALUE(t2.tv) AS tv, ANY_VALUE(t2.tc) AS tc,
        |    MIN(e.ts) FILTER (WHERE e.event_type = 'purchase' AND e.ts > t2.tc) AS tp
        |  FROM events e JOIN t2 USING (user_id) GROUP BY e.user_id)
        |SELECT stage, n_users FROM (
        |  SELECT '1_view' AS stage, COUNT(tv) AS n_users FROM t3
        |  UNION ALL SELECT '2_click', COUNT(tc) FROM t3
        |  UNION ALL SELECT '3_purchase', COUNT(tp) FROM t3)
        |ORDER BY stage""".stripMargin
  )
}
