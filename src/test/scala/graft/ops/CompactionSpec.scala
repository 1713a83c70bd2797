package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for [[Layout.compact]]: compaction must shrink the file count,
  * preserve the data exactly, and leave files with disjoint sort-key
  * ranges (the property that re-enables file-level min/max pruning).
  */
class CompactionSpec extends SparkSpec {

  test("compaction: 64 micro-batch files -> 4 range-disjoint files, " +
       "same rows, pruning-friendly layout") {
    import spark.implicits._
    val in  = tmpDir("graft_compact_in")
    val out = tmpDir("graft_compact_out")
    // simulate a micro-batch writer: 64 small unsorted files
    spark.range(10000)
      .select($"id", (($"id" * 2654435761L) % 1000).as("k"))
      .repartition(64)
      .write.mode("overwrite").parquet(in)

    val stats = Layout.compact(spark, in, out, "k", targetFiles = 4)
    assert(stats.filesBefore >= 60, stats.toString) // 64 minus empty splits
    assert(stats.filesAfter <= 4, stats.toString)
    assert(stats.rows == 10000L, stats.toString)

    // exact data preservation (multiset equality via sorted collect)
    val a = spark.read.parquet(in).orderBy($"id").collect()
    val b = spark.read.parquet(out).orderBy($"id").collect()
    assert(a.sameElements(b), "compaction changed the data")

    // per-file key ranges are disjoint — min/max pruning works again
    val ranges = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min($"k"), max($"k")).collect().head
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file ranges: ${ranges.toList}")
      case _ => ()
    }
  }

  test("maxRecordsPerFile rolls an oversized range into multiple files") {
    import spark.implicits._
    val in  = tmpDir("graft_roll_in")
    val out = tmpDir("graft_roll_out")
    spark.range(5000).select($"id", lit(1L).as("k"))
      .repartition(8).write.mode("overwrite").parquet(in)
    val stats = Layout.compact(spark, in, out, "k", targetFiles = 1,
                               maxRecordsPerFile = 1000L)
    assert(stats.filesAfter >= 5, stats.toString) // 5000 rows / 1000 cap
    assert(stats.rows == 5000L, stats.toString)
  }
}
