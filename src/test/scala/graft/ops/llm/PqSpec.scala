package graft.ops.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product-quantization laws (llm_pq_train / llm_pq_adc):
  *
  *  1. The code assignment is a total function — every vector gets
  *     exactly PqM codes, each within the codebook range.
  *  2. ADC is EXACTLY the distance to the quantized (reconstructed)
  *     vector: adc(q, x) = ‖q − decode(codes(x))‖², the defining PQ
  *     identity (Jégou et al. 2011, eq. 12) — verified by rebuilding the
  *     reconstruction from the codebooks test-side and recomputing the
  *     64-dim distance directly.
  *  3. The Lloyd refinement is a real training step: at least one vector
  *     moves off its seed code, and the census conserves the corpus
  *     (Σ n_vecs per subspace = corpus size).
  *
  *  Recall vs the exact L2 brute force is a property of the fixture's
  *  near-orthogonal random vectors, not of the implementation (the
  *  llm_ann_lsh stance) — reported via info() for COVERAGE.md, not
  *  asserted beyond nonemptiness.
  */
class PqSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("PQ encode is total: every vector carries exactly M in-range codes") {
    val (_, enc) = Similarity.pqModel(spark, dir)
    val nVecs = graft.Tables.embeddings(spark, dir).count()
    val perVec = enc.groupBy($"vec_id")
      .agg(count(lit(1)).as("n"), min($"code").as("lo"), max($"code").as("hi"))
      .agg(min($"n"), max($"n"), min($"lo"), max($"hi"), count(lit(1)))
      .as[(Long, Long, Int, Int, Long)].head()
    assert(perVec._1 === 8L && perVec._2 === 8L, "exactly M=8 codes per vector")
    assert(perVec._3 >= 0 && perVec._4 < 4, "codes within [0, Ks)")
    assert(perVec._5 === nVecs, "every corpus vector encoded")
  }

  test("ADC(q, x) == ||q - decode(codes(x))||^2 — the PQ identity") {
    val (book, enc) = Similarity.pqModel(spark, dir)
    // codebooks and codes, test-side
    val carr = book.select($"sub", $"code", $"carr")
      .as[(Int, Int, Seq[Double])].collect()
      .map { case (s, c, a) => (s, c) -> a.toArray }.toMap
    val codes = enc.select($"vec_id", $"sub", $"code")
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).map { case (v, rows) =>
        v -> rows.sortBy(_._2).map(_._3)
      }
    val vecs = Similarity.corpus(spark, dir)
      .select($"vec_id", $"v").as[(Long, Seq[Double])].collect()
      .map { case (v, a) => v -> a.toArray }.toMap
    val adc = Similarity.pqAdc(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(adc.nonEmpty)
    adc.foreach { case (q, _, n, d) =>
      val recon = codes(n).zipWithIndex.flatMap { case (c, s) => carr((s, c)) }
      val exact = vecs(q).zip(recon).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(math.abs(d - exact) < 1e-9,
        s"adc($q,$n)=$d but ||q-decode(x)||^2=$exact")
    }
  }

  test("IVF+PQ composition is pruning-only: top-3 of the same-cell subset " +
       "of all-pairs ADC, nothing invented, distances unchanged") {
    val (book, enc) = Similarity.pqModel(spark, dir)
    val carr = book.select($"sub", $"code", $"carr")
      .as[(Int, Int, Seq[Double])].collect()
      .map { case (s, c, a) => (s, c) -> a.toArray }.toMap
    val codes = enc.select($"vec_id", $"sub", $"code")
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).map { case (v, rows) => v -> rows.sortBy(_._2).map(_._3) }
    val vecs = Similarity.corpus(spark, dir)
      .select($"vec_id", $"v").as[(Long, Seq[Double])].collect()
      .map { case (v, a) => v -> a.toArray }.toMap
    val cellOf = Dedup.withIvfCell(Similarity.corpus(spark, dir))
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    def adcOf(q: Long, n: Long): Double = {
      val recon = codes(n).zipWithIndex.flatMap { case (c, s) => carr((s, c)) }
      vecs(q).zip(recon).map { case (x, y) => (x - y) * (x - y) }.sum
    }
    val expected = vecs.keys.filter(_ < 10).toSeq.sorted.flatMap { q =>
      vecs.keys.filter(n => n != q && cellOf(n) == cellOf(q)).toSeq
        .map(n => (n, adcOf(q, n)))
        .sortBy { case (n, d) => (d, n) }.take(3).zipWithIndex
        .map { case ((n, d), i) => (q, (i + 1).toLong, n, d) }
    }
    val got = Similarity.pqIvfAdc(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2, t._3)) ===
           expected.map(t => (t._1, t._2, t._3)))
    got.zip(expected).foreach { case ((_, _, _, d), (_, _, _, e)) =>
      assert(math.abs(d - e) < 1e-9)
    }
  }

  test("the refinement moved vectors and the census conserves the corpus") {
    val census = Similarity.pqTrain(spark, dir)
      .as[(Int, Int, Long, Long, Long, Long, Double)].collect()
    val nVecs = graft.Tables.embeddings(spark, dir).count()
    assert(census.map(_._4).sum > 0, "no vector moved — refinement was a no-op")
    census.groupBy(_._1).foreach { case (sub, rows) =>
      assert(rows.map(_._3).sum === nVecs, s"subspace $sub census != corpus")
    }
    // recall@3 of ADC vs exact L2 (fixture property, reported not gated)
    val exactTop = {
      val vecs = Similarity.corpus(spark, dir)
        .select($"vec_id", $"v").as[(Long, Seq[Double])].collect()
      val qs = vecs.filter(_._1 < 10)
      qs.map { case (q, qv) =>
        q -> vecs.filter(_._1 != q)
          .map { case (n, nv) =>
            (n, qv.zip(nv).map { case (x, y) => (x - y) * (x - y) }.sum)
          }
          .sortBy { case (n, d) => (d, n) }.take(3).map(_._1).toSet
      }.toMap
    }
    val adcTop = Similarity.pqAdc(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).toSet }
    val hits = adcTop.map { case (q, s) => (s & exactTop(q)).size }.sum
    info(f"ADC recall@3 vs exact: $hits/${3 * adcTop.size} = ${
      hits.toDouble / (3 * adcTop.size)}%.2f (4-code-per-subspace coarse PQ)")
  }
}
