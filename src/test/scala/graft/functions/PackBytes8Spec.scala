package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_pack8 must be indistinguishable from a byte-codes-array
  * spelling — the SuffixIndex seed ranks derive from it, so any drift
  * would silently reorder the global suffix array. Round 10: the pack is
  * BYTE-level (8 bits × 7 bytes), order-preserving over arbitrary UTF-8
  * byte strings — the property the retired 7-bit pack had only on ASCII.
  */
class PackBytes8Spec extends SparkSpec {

  private def reg(): Unit = GraftFunctions.register(spark)

  test("bit-identical to the hex-derived byte-array pack over every " +
       "byte position of the documents fixture (both words of the seed key)") {
    reg(); import spark.implicits._
    val diff = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"text", octet_length($"text").as("len"))
      .where($"len" > 0)
      // reference: per-byte codes via the hex spelling (2 hex chars per
      // byte — the same independent spelling the unicode oracles use)
      .withColumn("codes", expr(
        "transform(sequence(1, octet_length(text)), k -> " +
        "cast(conv(substr(hex(encode(text, 'UTF-8')), 2 * k - 1, 2), 16, 10) " +
        "as bigint))"))
      .select($"text", $"codes", explode(expr("sequence(0, len - 1)")).as("i"))
      .select(
        expr("graft_pack8(text, i)").as("n1"),
        expr("graft_pack8(text, i + 7)").as("n2"),
        expr("""aggregate(sequence(0, 6), 0L, (acc, k) ->
               |  acc * 256 + coalesce(get(codes, i + k), 0L))""".stripMargin)
          .as("a1"),
        expr("""aggregate(sequence(7, 13), 0L, (acc, k) ->
               |  acc * 256 + coalesce(get(codes, i + k), 0L))""".stripMargin)
          .as("a2"))
      .where($"n1" =!= $"a1" || $"n2" =!= $"a2")
      .count()
    assert(diff == 0L)
  }

  test("packing laws: order preservation matches UTF-8 BYTE order " +
       "(incl. CJK, emoji, combining marks), past-end pads as 0 " +
       "(shorter prefix sorts first), null in → null out") {
    reg(); import spark.implicits._
    val strs = Seq("", "a", "ab", "abc", "abcdefg", "abcdefgh",
                   "abd", "zzzzzzz", "abc def", "abc!", "~", " ",
                   "naïve", "naï", "日本語テスト", "日本", "éclair", "éclair",
                   "🦀rust", "🦀", "עברית", "ελλην")
    def bytes7(s: String): Array[Int] =
      s.getBytes("UTF-8").take(7).map(_ & 0xff).padTo(7, 0)
    def cmpBytes(x: String, y: String): Int = {
      val (bx, by) = (bytes7(x), bytes7(y))
      bx.zip(by).map { case (a, b) => java.lang.Integer.compare(a, b) }
        .find(_ != 0).getOrElse(0)
    }
    val packs = strs.toDF("s")
      .select($"s", expr("graft_pack8(s, 0)").as("p"))
      .as[(String, Long)].collect().toMap
    for (x <- strs; y <- strs) {
      val expected = math.signum(cmpBytes(x, y))
      val got = math.signum(java.lang.Long.compare(packs(x), packs(y)))
      assert(got == expected, s"order('$x' vs '$y')")
    }
    val n = Seq((null: String, 0)).toDF("s", "i")
      .select(expr("graft_pack8(s, i)")).collect()
    assert(n.head.isNullAt(0))
  }
}
