package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD2 structural laws: validity ranges must tile each key's timeline
  * with no gaps or overlaps, and exactly one open-ended current row per
  * key — these hold for ANY input, not just the fixture.
  */
class ScdSpec extends SparkSpec {

  import spark.implicits._

  private lazy val hist = Scd.scd2Q(spark, "/root/testdata/sf0.001").cache()

  test("exactly one current row per key, and it is the last version") {
    val perKey = hist.groupBy($"o_custkey").agg(
      sum(when($"is_current", 1L).otherwise(0L)).as("n_current"),
      max($"version").as("max_v"),
      max(when($"is_current", $"version")).as("current_v"))
    assert(perKey.filter($"n_current" =!= 1L).isEmpty)
    assert(perKey.filter($"max_v" =!= $"current_v").isEmpty)
  }

  test("ranges tile: effective_to of version n equals effective_from of n+1") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"version")
    val gaps = hist
      .withColumn("next_from", lead($"effective_from", 1).over(w))
      .filter($"next_from".isNotNull && ($"effective_to" =!= $"next_from"))
    assert(gaps.isEmpty)
    // and only the current row has an open range
    assert(hist.filter($"effective_to".isNull =!= $"is_current").isEmpty)
  }

  test("row count is preserved: every change event becomes one version") {
    val n = graft.Tables.orders(spark, "/root/testdata/sf0.001").count()
    assert(hist.count() === n)
  }
}
