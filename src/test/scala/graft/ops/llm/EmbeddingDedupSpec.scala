package graft.ops.llm

import graft.SparkSpec

/** The approximate (same-cell) embedding-dedup mode vs the exact
  * cell-pair mode: the approximation must be PRUNING-ONLY — it returns
  * exactly the exact-mode pairs whose endpoints quantize to the same IVF
  * cell, never an extra pair, never a divergent cosine — and its recall
  * against the exact pair set is measured here (recorded in COVERAGE.md
  * §Scale evidence; the residual is the standard IVF single-probe trade,
  * bounded by how often a near-dup pair straddles a cell boundary).
  */
class EmbeddingDedupSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("approx same-cell mode == exact mode ∩ same-cell (pruning-only: " +
       "nothing invented, same-cell pairs complete, cosines identical)") {
    val exact = Dedup.dedupEmbedding(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    val approx = Dedup.dedupEmbeddingApprox(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    val cellOf = Dedup.withIvfCell(Similarity.corpus(spark, dir))
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toMap
    // the exact pair set restricted to same-cell endpoints IS the
    // approximate result — cosine values bit-identical (Set equality on
    // the raw doubles), no pair added, no same-cell pair lost
    val expected = exact.filter { case (i, j, _) => cellOf(i) == cellOf(j) }
    assert(approx === expected)
    // recall: fixture-dependent, but must be nonzero (the fixture plants
    // near-dups) and is reported for COVERAGE.md
    assert(exact.nonEmpty && approx.nonEmpty)
    val recall = approx.size.toDouble / exact.size
    info(f"same-cell recall vs exact at cos>=0.45: ${approx.size}/${exact.size} = $recall%.2f")
    assert(recall >= 0.5, s"recall $recall collapsed — quantizer drift?")
  }

  test("semDedup clusters are exactly the connected components of the " +
       "approx pair graph: rep = component min, n_members = component " +
       "size, survivor a member — one survivor per component") {
    val pairs = Dedup.dedupEmbeddingApprox(spark, dir)
      .select($"i", $"j").as[(Long, Long)].collect()
    // reference components via in-test union-find over the tiny pair set
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val comps = parent.keys.toSeq.groupBy(find).map { case (_, ms) =>
      ms.min -> ms.toSet
    }
    val out = Dedup.semDedup(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).toSet === comps.keySet) // one row per component, rep = min
    out.foreach { case (rep, n, keep) =>
      assert(n === comps(rep).size.toLong, s"cluster $rep size")
      assert(comps(rep).contains(keep), s"survivor $keep not in cluster $rep")
    }
    assert(out.forall(_._2 >= 2)) // pair-connected components only
  }
}
