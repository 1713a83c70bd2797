package graft.ops

import graft.SparkSpec

/** Partitioning-invariance — the property the whole Det framework exists
  * for: a gated query must return BIT-IDENTICAL results no matter how
  * the data is partitioned, or the driver's hash gate (and any 100 TB
  * re-run after a topology change) becomes a lottery. Pinned by running
  * the same queries under different shuffle-partition counts.
  */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def runAt(parts: String, name: String): Array[String] = {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try graft.SparkEntry.queries(name)(spark, dir).collect().map(_.toString)
    finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  for (q <- Seq("q1_pricing_summary",   // decimal-exact float sums
                "llm_centroids",        // double means over embeddings
                "llm_tfidf",            // rational idf doubles
                "q14_promo_effect",     // derived double ratio
                "llm_substring_excise", // md5 reassembly from span windows
                "llm_semdedup",         // float-ordered keep policy
                "llm_span_corrupt",     // run-length sentinel splice checksums
                "llm_code_switch",      // broadcast-left-join argmax + set agg
                "llm_bq_topk",          // decimal thresholds + float rerank
                "llm_hard_negatives",   // float-ordered mining + margin
                "llm_ivf_add",          // decimal centroids + broadcast argmax
                "graph_components",     // iterative propagation + checkpoints
                "graph_khop",           // frontier BFS + checkpoints
                "graph_pagerank",       // integer micro-unit rank iterations
                "graph_pagerank_directed")) // + dangling-mass scalar frame
    test(s"$q is bit-identical under 3 vs 7 shuffle partitions") {
      val a = runAt("3", q)
      val b = runAt("7", q)
      assert(a.sameElements(b),
        a.zip(b).find(p => p._1 != p._2).toString)
    }
}
