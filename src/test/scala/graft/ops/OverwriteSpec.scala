package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition overwrite — the write discipline behind idempotent
  * backfills: re-running a day's job must replace exactly that day's
  * directories and leave every other partition byte-untouched. In static
  * mode (Spark's default) `mode("overwrite")` on a partitioned path
  * truncates the WHOLE table — the classic data-loss foot-gun this suite
  * pins the guard against.
  */
class OverwriteSpec extends SparkSpec {

  test("partitionOverwriteMode=dynamic replaces only the partitions " +
       "present in the incoming batch") {
    import spark.implicits._
    val path = tmpDir("graft_dpo")
    Seq((1L, "2024-01", 10.0), (2L, "2024-02", 20.0), (3L, "2024-03", 30.0))
      .toDF("id", "month", "v")
      .write.partitionBy("month").mode("overwrite").parquet(path)

    val before = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // the backfill rewrites ONLY 2024-02 (two corrected rows)
      Seq((4L, "2024-02", 21.0), (5L, "2024-02", 22.0))
        .toDF("id", "month", "v")
        .write.partitionBy("month").mode("overwrite").parquet(path)

      val after = spark.read.parquet(path)
        .select($"id", $"month", $"v").orderBy($"id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toList
      assert(after == List(
        (1L, "2024-01", 10.0), (3L, "2024-03", 30.0),
        (4L, "2024-02", 21.0), (5L, "2024-02", 22.0)), after.toString)
    } finally before match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("static mode (the default) truncates the whole table — the guard " +
       "documents WHY jobs must set dynamic for partition backfills") {
    import spark.implicits._
    val path = tmpDir("graft_spo")
    Seq((1L, "2024-01", 10.0), (2L, "2024-02", 20.0))
      .toDF("id", "month", "v")
      .write.partitionBy("month").mode("overwrite").parquet(path)
    Seq((9L, "2024-02", 99.0)).toDF("id", "month", "v")
      .write.partitionBy("month").mode("overwrite").parquet(path)
    val months = spark.read.parquet(path)
      .select($"month").distinct().as[String].collect().sorted.toList
    assert(months == List("2024-02"),
      s"static overwrite should have dropped 2024-01: $months")
  }
}
