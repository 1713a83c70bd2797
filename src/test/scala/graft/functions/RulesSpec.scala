package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The injected optimizer rule: exact distinct → HLL++ sketch under the
  * opt-in conf, untouched otherwise (and untouched for shapes the sketch
  * cannot express).
  */
class RulesSpec extends SparkSpec {

  import spark.implicits._

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private def optimized(df: org.apache.spark.sql.DataFrame): String = {
    ApproxDistinctRewrite.register(spark)
    df.queryExecution.optimizedPlan.toString
  }

  private def cd = spark.range(10000)
    .select(($"id" % 7).as("k"), ($"id" % 1000).as("v"))
    .groupBy($"k").agg(countDistinct($"v").as("nd"))

  test("conf off (default): count(distinct) stays exact") {
    val p = optimized(cd)
    assert(p.contains("count(distinct"), p)
    assert(!p.contains("approx_count_distinct"), p)
  }

  test("conf on: count(distinct) rewrites to approx_count_distinct and " +
       "the estimate lands within rsd of the exact answer") {
    withConf(ApproxDistinctRewrite.ConfKey -> "true") {
      val p = optimized(cd)
      assert(p.contains("approx_count_distinct"), p)
      assert(!p.contains("count(distinct"), p)
      val rows = cd.collect().map(r => r.getLong(1))
      // every group has ~1000 distinct values; 5% rsd → generous ±10% gate
      assert(rows.forall(n => n > 900 && n < 1100), rows.mkString(","))
    }
  }

  test("multi-column count(distinct a, b) is out of scope and unchanged") {
    withConf(ApproxDistinctRewrite.ConfKey -> "true") {
      val df = spark.range(100).select(($"id" % 5).as("a"), ($"id" % 7).as("b"))
        .agg(countDistinct($"a", $"b").as("nd"))
      val p = optimized(df)
      assert(!p.contains("approx_count_distinct"), p)
      assert(df.collect().head.getLong(0) === 35L)
    }
  }

  test("rsd conf tightens the sketch (0.01 → exact-ish on small groups)") {
    withConf(ApproxDistinctRewrite.ConfKey -> "true",
             ApproxDistinctRewrite.RsdKey -> "0.01") {
      val df = spark.range(1000).select(($"id" % 50).as("v"))
        .agg(countDistinct($"v").as("nd"))
      assert(optimized(df).contains("approx_count_distinct"))
      val n = df.collect().head.getLong(0)
      assert(n === 50L, s"got $n")
    }
  }
}
