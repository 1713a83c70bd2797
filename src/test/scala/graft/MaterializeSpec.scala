package graft

import graft.state.Materialize

/** `spark.graft.materialize=reliable` must be a pure execution-strategy
  * switch: every pipeline that pins intermediates (winnow pairs, MinHash
  * connected components, suffix-array rounds, TextRank) returns
  * bit-identical results under reliable checkpointing, it just stores
  * the pinned data in the checkpoint dir instead of executor block
  * storage (the 100 TB posture — VERDICT r6 item 8).
  */
class MaterializeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def withMode[A](mode: String)(f: => A): A = {
    spark.conf.set(Materialize.ModeKey, mode)
    try f finally spark.conf.set(Materialize.ModeKey, "local")
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("reliable checkpoint mode matches local mode on pinned pipelines") {
    val qs = SparkEntry.queries
    // one per pin-heavy family: fingerprint reuse, CC iteration loop,
    // prefix-doubling rounds, PageRank iterations. The memo layer is
    // cleared before EACH mode's run: a cache hit would hand the
    // reliable run the local run's pinned frame and the comparison
    // would be vacuous (the r11 winnow/span memoization made the
    // un-cleared form exactly that).
    Seq("llm_winnow_pairs", "llm_dedup_clusters", "llm_suffix_array",
        "llm_textrank").foreach { name =>
      Materialize.clearSessionCaches()
      val local    = canon(qs(name)(spark, dir))
      Materialize.clearSessionCaches()
      val reliable = withMode("reliable")(canon(qs(name)(spark, dir)))
      assert(local.nonEmpty, s"$name: empty result")
      assert(reliable == local, s"$name: reliable mode drifts from local")
    }
  }

  test("unknown materialize mode fails fast") {
    // a memo-cache hit would serve the already-pinned frame and never
    // reach the mode dispatch — force the MISS
    Materialize.clearSessionCaches()
    val e = withMode("spill-to-floppy") {
      intercept[IllegalArgumentException](
        SparkEntry.queries("llm_winnow_pairs")(spark, dir).collect())
    }
    assert(e.getMessage.contains("spark.graft.materialize"))
  }
}
