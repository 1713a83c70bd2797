package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Optimization-round plan capture: `.explain("formatted")` of named
  * queries into one file each — the evidence the round's plan-shape
  * claims (Exchange count, join strategy, PushedFilters/ReadSchema,
  * WholeStageCodegen spans) are checked against.
  *
  *   sbt "runMain graft.PlanCapture <outDir> <suffix> [q1,q2,...]"
  *
  * Writes `<outDir>/<query>_<suffix>.txt` (e.g. plans/r17/foo_before.txt).
  * With no query list, captures every declared query. Formatted mode is
  * used (unlike [[Plans]]' tree dump) because it names pushed filters and
  * read schemas per scan — the §6 evidence a tree dump elides.
  */
object PlanCapture {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanCapture <outDir> <suffix> [q1,q2,...] [sfDir]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names: Seq[String] =
      if (args.length > 2 && args(2).nonEmpty) args(2).split(",").map(_.trim).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "220")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val txt =
        try fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"<explain failed: ${e.getMessage}>" }
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[plan-capture] $name -> ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
