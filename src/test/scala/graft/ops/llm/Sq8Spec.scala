package graft.ops.llm

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for SQ8 scalar quantization that the DuckDB hash-gate (which
  * replays the same arithmetic) cannot distinguish from coincidence: the
  * quantizer's approximation guarantee (midpoint dequantization is within
  * half a bucket of the original, everywhere), code-range validity, and
  * that the asymmetric search ranks by a faithful proxy (its top-1 agrees
  * with the exact-L2 top-1 for nearly every query on the fixture).
  */
class Sq8Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("sq8 codes are integral in [0, 255] and midpoint dequantization " +
       "is within half a bucket of the original value, every element") {
    import spark.implicits._
    val enc = Similarity.sq8Encode(Similarity.corpus(spark, dir))
    val viol = enc
      .select($"v", $"mn", $"rg", posexplode($"code").as(Seq("d", "cd")))
      .withColumn("x", element_at($"v", $"d" + 1))
      .withColumn("m", element_at($"mn", $"d" + 1))
      .withColumn("r", element_at($"rg", $"d" + 1))
      .withColumn("xhat", $"m" + ($"cd" + lit(0.5)) * ($"r" / 255.0))
      // bound: half a bucket, with headroom for the clamp case (x = vmax
      // encodes to 255, landing exactly half a bucket above) + fp eps
      .withColumn("bound", $"r" / 255.0 * 0.5000001 + lit(1e-12))
      .filter($"cd" < 0 || $"cd" > 255 || $"cd" =!= floor($"cd") ||
              ($"r" > 0 && abs($"x" - $"xhat") > $"bound"))
      .count()
    assert(viol === 0L)
  }

  test("sq8 asymmetric top-1 agrees with the exact-L2 top-1 for nearly " +
       "every query (8-bit buckets are far finer than neighbor margins)") {
    import spark.implicits._
    val c = Similarity.corpus(spark, dir)
    val q = c.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"v".as("vq"))
    val w = Window.partitionBy($"q_id").orderBy($"d2".asc, $"n_id")
    val exact = c.select($"vec_id".as("n_id"), $"v".as("vc"))
      .join(broadcast(q), $"n_id" =!= $"q_id")
      .withColumn("dd", expr("zip_with(vq, vc, (a, b) -> a - b)"))
      .withColumn("d2", call_function("graft_dot", $"dd", $"dd"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" === 1).select($"q_id", $"n_id".as("exact1"))
    val sq8 = Similarity.sq8TopK(spark, dir).filter($"rk" === 1)
      .select($"q_id", $"n_id".as("sq81"))
    val agree = exact.join(sq8, "q_id")
      .filter($"exact1" === $"sq81").count()
    assert(agree >= 8L, s"top-1 agreement only $agree/10")
  }
}
