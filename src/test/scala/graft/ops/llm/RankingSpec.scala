package graft.ops.llm

import graft.SparkSpec

/** The TextRank gate runs its fixed-point iterations in driver memory when
  * the graph is broadcast-sized; the distributed iterate is the 100 TB
  * path. Same integer ops on both substrates ⇒ identical ranks — pinned
  * here so the two paths can never drift.
  */
class RankingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("textrank local and distributed paths produce identical ranks") {
    val local = Ranking.textrank(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val dist = Ranking.textrankDistributed(spark, Ranking.bigramEdges(spark, dir))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(local.nonEmpty)
    assert(local.toSeq === dist.toSeq)
  }

  test("RRF fusion laws: every fused doc comes from a leg's top-60, " +
       "score is the rank-reciprocal sum, two-leg docs beat the floor") {
    import spark.implicits._
    val out = Ranking.rrfFusion(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length === 10)
    out.foreach { case (doc, rLex, rQ, rrf) =>
      assert(rLex > 0 || rQ > 0, s"doc $doc in neither leg's top-60")
      assert(rLex <= 60 && rQ <= 60)
      val expect = (if (rLex > 0) 1.0 / (60.0 + rLex) else 0.0) +
                   (if (rQ > 0) 1.0 / (60.0 + rQ) else 0.0)
      assert(rrf === expect, s"doc $doc rrf mismatch")
    }
    // descending, ties by doc_id — the gate's presentation order
    assert(out.sliding(2).forall { case Array((d1, _, _, s1), (d2, _, _, s2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2) })
  }
}
