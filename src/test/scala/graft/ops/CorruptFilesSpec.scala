package graft.ops

import graft.SparkSpec

/** Bad-file resilience — at 100 TB a handful of truncated/corrupt parquet
  * files per load is a statistical certainty, and the difference between
  * "the nightly job fails at hour 6" and "the job completes minus the bad
  * split" is one conf. Pin both behaviors so neither regresses silently.
  */
class CorruptFilesSpec extends SparkSpec {

  private def corruptedDir(): String = {
    import spark.implicits._
    val dir = tmpDir("graft_corrupt")
    Seq(1L, 2L, 3L).toDF("id").write.mode("overwrite").parquet(dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-garbage.parquet"),
      "this is not a parquet file".getBytes)
    dir
  }

  test("ignoreCorruptFiles=true completes the scan minus the bad file") {
    val dir = corruptedDir()
    val prev = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      import spark.implicits._
      val ids = spark.read.parquet(dir).as[Long].collect().sorted
      assert(ids.toList == List(1L, 2L, 3L), ids.toList.toString)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None    => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }

  test("default (fail-fast) surfaces the corrupt file as an error, not " +
       "silent data loss") {
    val dir = corruptedDir()
    val e = intercept[Exception] {
      spark.read.parquet(dir).count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.toLowerCase.matches("(?s).*(parquet|corrupt|footer|magic).*"),
      s"unexpected error shape: $e")
  }
}
