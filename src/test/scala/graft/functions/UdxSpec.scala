package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C33/C34 unit coverage: the scalar UDF contract and the MinHash
  * signature Aggregator's algebraic properties (order/partitioning
  * independence — what makes it exact at any scale).
  */
class UdxSpec extends SparkSpec {

  import spark.implicits._

  test("slugify UDF normalizes and handles null") {
    val out = Seq("  Hello, World! ", "a b", null)
      .toDF("s").select(Udx.slugify($"s")).as[String].collect().toSeq
    assert(out === Seq("hello-world-", "a-b", null))
  }

  test("MinSignatureAggregator is order- and partitioning-independent") {
    val k = 16
    val shingles = (1 to 100).map(i => s"shingle_$i")
    val agg = udaf(new Udx.MinSignatureAggregator(k))
    def signature(data: Seq[String], partitions: Int): Seq[Long] =
      data.map(s => Tuple1(Udx.hashFamily(s, k))).toDF("h")
        .repartition(partitions)
        .agg(agg($"h").as("sig"))
        .as[Seq[Long]].head()
    val s1 = signature(shingles, 1)
    val s2 = signature(scala.util.Random.shuffle(shingles), 7)
    assert(s1 === s2) // exact signature regardless of order/partitioning
    // and equals the hand-computed elementwise min
    val expected = (0 until k).map(i => shingles.map(s => Udx.hashFamily(s, k)(i)).min)
    assert(s1 === expected)
  }

  test("signature of a union is the elementwise min of signatures (mergeability)") {
    val k = 8
    val a = (1 to 40).map(i => s"a_$i")
    val b = (1 to 40).map(i => s"b_$i")
    def sig(data: Seq[String]): Seq[Long] = {
      val hs = data.map(s => Udx.hashFamily(s, k))
      (0 until k).map(i => hs.map(_(i)).min)
    }
    val merged = sig(a ++ b)
    val combined = sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
    assert(merged === combined)
  }
}
