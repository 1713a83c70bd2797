package graft.ops.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the Johnson–Lindenstrauss random projection
  * ([[Similarity.rpProject]] / gate `llm_rp_topk`).
  *
  * The projection's CONTRACT is distance preservation in expectation —
  * with ±1 entries, E[⟨a−b, w_j⟩²] = ‖a−b‖², so the 16-dim squared
  * distance is an unbiased 16·‖a−b‖² estimate. That law (not top-k
  * recall, which the near-equidistant synthetic fixture cannot exhibit
  * at k = 16) is what the spec pins, alongside an independent JVM
  * replay of the matrix + projection arithmetic.
  */
class RpSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** Independent 60-bit md5 prefix — same contract as CrossHash.hex60,
    * reimplemented on MessageDigest so the test shares no code with the
    * library path.
    */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  private def jvmMatrix: Array[Array[Double]] =
    Array.tabulate(16, 64)((j, d) =>
      if (h60(s"rp_${j}_$d") % 2 == 0) 1.0 else -1.0)

  private def dot(v: Seq[Double], w: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < w.length) { acc += v(i) * w(i); i += 1 }
    acc
  }

  private def fixtureVecs: Array[(Long, Seq[Double])] =
    graft.Tables.embeddings(spark, dir)
      .select($"vec_id", expr("transform(embedding, x -> cast(x as double))"))
      .as[(Long, Seq[Double])].collect()

  test("projection matches an independent JVM replay of the ±1 matrix " +
       "and the left-to-right dot fold") {
    val mat = jvmMatrix
    val expected = fixtureVecs.map { case (id, v) =>
      id -> mat.map(w => dot(v, w)).toSeq
    }.toMap
    val out = Similarity.rpProject(spark, dir)
      .as[(Long, Seq[Double])].collect().toMap
    assert(out.keySet === expected.keySet)
    out.foreach { case (id, p) => assert(p === expected(id), s"vec $id") }
  }

  test("JL unbiasedness: mean over all query pairs of " +
       "projected_d2 / (16 * full_d2) is ~1") {
    val mat = jvmMatrix
    val vecs = fixtureVecs
    val proj = vecs.map { case (id, v) => id -> mat.map(w => dot(v, w)) }.toMap
    val ratios = for {
      (q, vq) <- vecs if q < 10
      (c, vc) <- vecs if c != q
    } yield {
      val full = vq.indices.map(i => (vq(i) - vc(i)) * (vq(i) - vc(i))).sum
      val pq = proj(q); val pc = proj(c)
      val prjd = pq.indices.map(i => (pq(i) - pc(i)) * (pq(i) - pc(i))).sum
      prjd / (16.0 * full)
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2,
      s"JL estimate biased: mean ratio $mean over ${ratios.size} pairs")
  }
}
