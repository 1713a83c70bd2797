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
}
