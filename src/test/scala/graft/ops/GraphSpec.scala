package graft.ops

import graft.SparkSpec

/** Structural laws for the degree-oriented triangle counter: the
  * orientation must count each triangle exactly once, independent of the
  * degree distribution — verified against graphs with KNOWN counts and
  * against the naive id-ordered 3-way self-join.
  */
class GraphSpec extends SparkSpec {

  private def edgeDf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    // normalize to a < b, dedup — the contract triangleSummary assumes
    es.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .distinct.toDF("a", "b")
  }

  private def naiveTriangles(es: Seq[(Long, Long)]): Long = {
    val e = es.map { case (x, y) => (math.min(x, y), math.max(x, y)) }.distinct.toSet
    val vs = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    (for {
      i <- vs; j <- vs if i < j && e((i, j))
      k <- vs if j < k && e((j, k)) && e((i, k))
    } yield 1).size.toLong
  }

  private def count(es: Seq[(Long, Long)]): (Long, Long, Long) = {
    val r = Graph.triangleSummary(spark, edgeDf(es)).head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("K4: 4 vertices, 6 edges, 4 triangles") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(count(k4) === ((4L, 6L, 4L)))
  }

  test("triangle-free path graph counts zero") {
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L)))._3 === 0L)
  }

  test("hub-and-spoke star with one closing rim edge: exactly 1 triangle (skew shape)") {
    // vertex 0 is a hub of degree 9 — the shape degree orientation exists
    // for: the hub must not become a wedge center
    val star = (1L to 9L).map(i => (0L, i)) :+ (1L, 2L)
    assert(count(star) === ((10L, 10L, 1L)))
  }

  test("matches the naive enumeration on a pseudo-random graph") {
    // deterministic LCG so the test is reproducible
    var s = 12345L
    def nxt(n: Long): Long = { s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; s % n }
    val es = Seq.fill(120)((nxt(25), nxt(25))).filter { case (x, y) => x != y }
    assert(count(es)._3 === naiveTriangles(es))
  }

  test("starComponents: adversarial long chain, cycle, star and forest " +
       "all match a driver-side union-find (the chain is the shape that " +
       "bound the retired min-label propagation to its diameter)") {
    import spark.implicits._
    def unionFind(es: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    // ids shuffled so the chain's minimum sits mid-chain, not at an end
    val rnd = new scala.util.Random(42)
    val ids = rnd.shuffle((1L to 2000L).toVector)
    val chain = ids.sliding(2).map(p => (p(0), p(1))).toSeq
    val cycle = (3000L to 3040L).map(i => (i, if (i == 3040L) 3000L else i + 1))
    val star = (4001L to 4050L).map(i => (4000L, i))
    val graphs = Seq(chain, cycle, star, chain ++ cycle ++ star)
    graphs.foreach { es =>
      val expected = unionFind(es)
      val got = graft.ops.llm.Dedup
        .starComponents(es.toDF("d1", "d2"))
        .as[(Long, Long)].collect().toMap
      assert(got === expected)
    }
  }

  test("dedupClusters matches GraphX ConnectedComponents on the fixture " +
       "near-dup graph (independent engine cross-check)") {
    // GraphX CC converges to the minimum vertex id per component — the
    // same representative our min-label propagation selects, so the two
    // must agree EXACTLY on both membership and representative.
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val ours = graft.ops.llm.Dedup.dedupClusters(spark, dir)
      .as[(Long, Long)].collect().toMap
    assert(ours.nonEmpty, "fixture produced no near-dup clusters")
    val edges = graft.ops.llm.Dedup.nearDupPairs(spark, dir)
      .select($"d1", $"d2").as[(Long, Long)].rdd
    val cc = org.apache.spark.graphx.lib.ConnectedComponents
      .run(org.apache.spark.graphx.Graph.fromEdgeTuples(edges, 0))
      .vertices.collect().toMap
    assert(ours.keySet === cc.keySet)
    ours.foreach { case (doc, rep) => assert(cc(doc) === rep, s"doc $doc") }
  }
}
