package graft.pipeline

/** Deterministic embedding fixtures engineered against the engine's
  * md5-derived IVF quantizer (the PUBLIC centroid formula — rebuilt
  * here independently so quantizer drift fails the specs loudly).
  */
object EmbeddingFixtures {

  /** IVF centroid c, rebuilt from the public md5 formula through the
    * engine's ONE hash spelling (CrossHash.hex60Jvm — a second verbatim
    * copy of the routine here could drift; self-review r13 pass 1).
    */
  def centroid(c: Int): Array[Double] =
    Array.tabulate(64)(d =>
      graft.ops.llm.CrossHash.hex60Jvm(s"ivf_${c}_$d").toDouble /
        576460752303423488.0 - 1.0)

  def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** Two vectors near the c0/c1 cell boundary, nudged to land in
    * DIFFERENT argmax cells while keeping cosine ≈ 1 — the pair
    * single-probe structurally cannot see (callers ASSERT the cell
    * split so drift fails loudly).
    */
  def crossCellPair(): (Array[Double], Array[Double]) = {
    val (u0, u1) = (unit(centroid(0)), unit(centroid(1)))
    val mid = Array.tabulate(64)(i => u0(i) + u1(i))
    val a = Array.tabulate(64)(i => mid(i) + 0.05 * u0(i))
    val b = Array.tabulate(64)(i => mid(i) + 0.05 * u1(i))
    (a, b)
  }

  /** An INDIRECT-partner chain a ~ b ~ c inside cell 0: b sits exactly
    * on the centroid direction (so it is the MOST centroid-similar
    * member — the pairwise loser of both its pairs), and a/c are ±θ
    * rotations of b in a plane orthogonal-completed from the centroid,
    * giving cos(a,b) = cos(b,c) = cosθ and cos(a,c) = cos2θ. Any
    * threshold in (cos2θ, cosθ] makes (a,b) and (b,c) pairs while
    * (a,c) is NOT one — the exact configuration where the pairwise
    * keep rule (keeps BOTH a and c) and the cluster-exact rule (keeps
    * exactly one of the component {a,b,c}) disagree.
    */
  def indirectChain(cosTheta: Double): (Array[Double], Array[Double], Array[Double]) = {
    val u0 = unit(centroid(0))
    // orthonormal completion: e1 minus its u0 projection, normalized
    val e1 = Array.tabulate(64)(i => if (i == 1) 1.0 else 0.0)
    val proj = u0(1)
    val w = unit(Array.tabulate(64)(i => e1(i) - proj * u0(i)))
    val sinTheta = math.sqrt(1.0 - cosTheta * cosTheta)
    val b = u0
    val a = Array.tabulate(64)(i => cosTheta * u0(i) + sinTheta * w(i))
    val c = Array.tabulate(64)(i => cosTheta * u0(i) - sinTheta * w(i))
    (a, b, c)
  }
}
