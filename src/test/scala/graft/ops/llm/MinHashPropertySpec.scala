package graft.ops.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The MinHash estimator property the LSH banding analysis rests on:
  * P(minhash agreement) = Jaccard. Checked against the SAME double-hash
  * permutation family the gated query uses (base hash once, per-
  * permutation hash over the base), on generated set pairs with known
  * overlap — independent of the fixture corpus. Pure JVM: the property
  * is about the hash family, not the execution engine.
  */
class MinHashPropertySpec extends AnyFunSuite {

  private val numPerm = 128

  // The query's scheme (Dedup.dedupNearMinhash): h = H(s); mh_i = min H(h, i).
  // XXH64 isn't reimplemented here (that would test nothing); any good
  // 64-bit family has the property — we use the same double-hash SHAPE
  // over MurmurHash3 and verify the ESTIMATOR, which is hash-agnostic.
  private def baseHash(s: String): Long = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x1234)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x5678)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }
  private def permHash(h: Long, i: Int): Long = {
    // SplitMix64-style finalizer seeded by the permutation index —
    // a public-domain mixing function
    var z = h + 0x9e3779b97f4a7c15L * (i + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def signature(set: Set[String]): Array[Long] =
    Array.tabulate(numPerm)(i => set.map(s => permHash(baseHash(s), i)).min)

  private def agreement(a: Array[Long], b: Array[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / numPerm

  test("signature agreement estimates Jaccard within sketch error (3 sigma)") {
    val gen = for {
      shared <- Gen.choose(5, 120)
      onlyA  <- Gen.choose(0, 80)
      onlyB  <- Gen.choose(0, 80)
    } yield (shared, onlyA, onlyB)
    for (seed <- 0 until 25) {
      val (shared, onlyA, onlyB) =
        gen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val s = (1 to shared).map(i => s"sh_$i").toSet
      val a = s ++ (1 to onlyA).map(i => s"a_$i")
      val b = s ++ (1 to onlyB).map(i => s"b_$i")
      val j = shared.toDouble / (shared + onlyA + onlyB)
      val est = agreement(signature(a), signature(b))
      // binomial std dev of the estimator at 128 permutations
      val sigma = math.sqrt(j * (1 - j) / numPerm)
      assert(math.abs(est - j) <= 3 * sigma + 0.01,
        s"J=$j est=$est (shared=$shared, onlyA=$onlyA, onlyB=$onlyB)")
    }
  }

  test("identical sets agree exactly; disjoint sets agree (essentially) never") {
    val a = (1 to 100).map(i => s"x_$i").toSet
    assert(agreement(signature(a), signature(a)) === 1.0)
    val b = (1 to 100).map(i => s"y_$i").toSet
    assert(agreement(signature(a), signature(b)) <= 0.03)
  }

  test("banding bound: 32 bands x 4 rows catches J >= 0.8 pairs (the fixture's lowest true pair)") {
    // P(candidate) = 1 - (1 - J^4)^32; verify empirically over 200 pairs at J=0.8
    var caught = 0
    val trials = 200
    for (t <- 0 until trials) {
      val shared = 80; val extra = 10 // J = 80/100 per side overlap  => J = 0.8
      val s = (1 to shared).map(i => s"t${t}_s$i").toSet
      val a = s ++ (1 to extra).map(i => s"t${t}_a$i")
      val b = s ++ (1 to extra).map(i => s"t${t}_b$i")
      val sa = signature(a); val sb = signature(b)
      val shares = (0 until 32).exists { band =>
        (0 until 4).forall(r => sa(band * 4 + r) == sb(band * 4 + r))
      }
      if (shares) caught += 1
    }
    // expected catch rate 1-(1-0.8^4)^32 ~ 1 - 5e-8; allow a couple misses
    assert(caught >= trials - 2, s"caught $caught/$trials")
  }
}
