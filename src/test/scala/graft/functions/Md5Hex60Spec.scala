package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_md5_60 must be indistinguishable from the SQL hex60 form it
  * replaces — bit-identical on every input, codegen-compatible, and
  * null-correct — or every fingerprint gate would silently drift from
  * its DuckDB oracle.
  */
class Md5Hex60Spec extends SparkSpec {

  private def reg(): Unit = GraftFunctions.register(spark)

  test("bit-identical to cast(conv(substr(md5(x),1,15),16,10) as bigint) " +
       "over the whole documents fixture + adversarial strings") {
    reg(); import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"text".as("s"))
    val extra = Seq("", " ", "a", "é世界", "0" * 1000)
      .toDF("s")
    val diff = docs.union(extra)
      .select(
        expr("graft_md5_60(s)").as("native"),
        expr("cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)").as("sql"))
      .where($"native" =!= $"sql")
      .count()
    assert(diff == 0L)
  }

  test("matches the JVM twin used for driver-side constants") {
    reg(); import spark.implicits._
    val v = Seq("ivf_0_0", "x#split").toDF("s")
      .select(expr("graft_md5_60(s)")).as[Long].collect()
    assert(v(0) == crossHashJvm("ivf_0_0") && v(1) == crossHashJvm("x#split"))
  }

  private def crossHashJvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("null in, null out; participates in whole-stage codegen") {
    reg(); import spark.implicits._
    val r = Seq(Some("x"), None).toDF("s")
      .select(expr("graft_md5_60(s)").as("h")).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
    // a local Seq plans as LocalTableScan (no codegen stage at all) — use
    // a real scan so the projection actually lands in a codegen stage
    val plan = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(expr("graft_md5_60(text)"))
      .queryExecution.executedPlan.toString
    // "*(1) Project" = the projection sits inside whole-stage-codegen
    // stage 1 (the starred prefix is how the simple plan string marks it)
    assert(plan.contains("*(1) Project [graft_md5_60"), plan)
  }

  test("graft_md5_60_at(text, i, k) is bit-identical to " +
       "graft_md5_60(substring(text, i+1, k)) over every fixture " +
       "position, including the clamped tail and past-end positions") {
    reg(); import spark.implicits._
    import org.apache.spark.sql.functions._
    val diff = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"text", length($"text").as("len"))
      .where($"len" > 0)
      // i runs PAST the end on purpose (len + 2) to pin the clamping
      .select($"text", explode(expr("sequence(0, len + 2)")).as("i"))
      .select(
        expr("graft_md5_60_at(text, i, 8)").as("nat"),
        expr("graft_md5_60(substring(text, i + 1, 8))").as("sql"))
      .where($"nat" =!= $"sql")
      .count()
    assert(diff == 0L)
  }
}
