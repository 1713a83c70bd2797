package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural laws for the round-4 event analytics — properties the
  * DuckDB oracle can't state (it only pins equality of one run) but that
  * must hold for ANY input: conservation between the retention matrix
  * and its cohorts, streak/island tiling, and attribution causality.
  */
class TimeSeriesLawsSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("ohlc: fixture respects the order-key packing bound " +
       "(event_id < 10^9, so the packed BIGINT sort key is injective)") {
    // The OHLC order key packs (µs-offset-in-bucket × 10^9 + event_id);
    // an id at or above 10^9 would bleed into the offset field and
    // open/close would silently pick the wrong event (the oracle repeats
    // the formula, so the gate could not see it — ADVICE r4). This pins
    // the precondition on the fixture the gates actually run against.
    val maxId = graft.Tables.events(spark, dir)
      .agg(max($"event_id")).as[Long].collect().head
    assert(maxId < 1000000000L, s"event_id $maxId breaks the OHLC packing")
  }

  test("retention: offset-0 row counts the whole cohort, and no offset " +
       "exceeds it (users can only be retained, not invented)") {
    val r = TimeSeries.retention(spark, dir)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val cohortSize = r.filter(_._2 == 0L).map(x => x._1 -> x._3).toMap
    assert(cohortSize.nonEmpty)
    for ((cohort, off, n) <- r) {
      assert(cohortSize.contains(cohort),
        s"cohort $cohort has offset rows but no offset-0 row")
      assert(n <= cohortSize(cohort),
        s"cohort $cohort offset $off retains $n > cohort ${cohortSize(cohort)}")
    }
  }

  test("retention: total user mass equals the user count (each user in " +
       "exactly one cohort at offset 0)") {
    val total = TimeSeries.retention(spark, dir)
      .where($"offset_wk" === 0).agg(sum($"n_users")).as[Long].collect().head
    val users = graft.Tables.events(spark, dir)
      .select($"user_id").distinct().count()
    assert(total === users)
  }

  test("streaks: best streak never exceeds the user's active-day count, " +
       "and islands tile it exactly") {
    val activeDays = graft.Tables.events(spark, dir)
      .select($"user_id", expr("(ts div 1000) div 86400000000").as("day"))
      .distinct().groupBy($"user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = TimeSeries.streaks(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(s.nonEmpty)
    for ((user, best, nStreaks) <- s) {
      assert(best <= activeDays(user))
      assert(nStreaks >= 1 && best >= 1)
      // islands partition the active days: nStreaks islands of length
      // >= 1 each, at least one of length `best`
      assert(best + (nStreaks - 1) <= activeDays(user))
    }
  }

  test("attribution: one output row per purchase, and every attributed " +
       "source strictly precedes its purchase") {
    val out = TimeSeries.attribution(spark, dir)
    val nPurchases = graft.Tables.events(spark, dir)
      .where($"event_type" === "purchase").count()
    assert(out.count() === nPurchases)
    assert(out.where($"src_id" =!= -1L && $"lag_us" <= 0L).count() === 0L,
      "an attributed source did not strictly precede its purchase")
    assert(out.where($"src_id" === -1L && $"src_type" =!= "none").count() === 0L)
  }
}
