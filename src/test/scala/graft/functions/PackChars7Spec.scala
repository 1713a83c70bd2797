package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_pack7 must be indistinguishable from the array spelling it
  * replaces — the SuffixIndex seed ranks derive from it, so any drift
  * would silently reorder the global suffix array.
  */
class PackChars7Spec extends SparkSpec {

  private def reg(): Unit = GraftFunctions.register(spark)

  test("bit-identical to the per-doc codes-array pack over every " +
       "position of the documents fixture (both words of the seed key)") {
    reg(); import spark.implicits._
    val diff = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"text", length($"text").as("len"))
      .where($"len" > 0)
      .withColumn("codes", expr(
        "transform(filter(split(text, ''), c -> c <> ''), " +
        "c -> cast(ascii(c) as bigint))"))
      .select($"text", $"codes", explode(expr("sequence(0, len - 1)")).as("i"))
      .select(
        expr("graft_pack7(text, i)").as("n1"),
        expr("graft_pack7(text, i + 8)").as("n2"),
        expr("""aggregate(sequence(0, 7), 0L, (acc, k) ->
               |  acc * 128 + coalesce(get(codes, i + k), 0L))""".stripMargin)
          .as("a1"),
        expr("""aggregate(sequence(8, 15), 0L, (acc, k) ->
               |  acc * 128 + coalesce(get(codes, i + k), 0L))""".stripMargin)
          .as("a2"))
      .where($"n1" =!= $"a1" || $"n2" =!= $"a2")
      .count()
    assert(diff == 0L)
  }

  test("packing laws: order preservation matches string order on ASCII, " +
       "past-end pads as 0 (shorter prefix sorts first), null in → null out") {
    reg(); import spark.implicits._
    val strs = Seq("", "a", "ab", "abc", "abcdefgh", "abcdefghi",
                   "abd", "zzzzzzzz", "abc defg", "abc!", "~", " ")
    // pairwise: sign(pack(x,0) compare pack(y,0)) == sign of the string
    // comparison on the first 8 chars (padded semantics)
    val packs = strs.toDF("s")
      .select($"s", expr("graft_pack7(s, 0)").as("p"))
      .as[(String, Long)].collect().toMap
    for (x <- strs; y <- strs) {
      val sx = x.take(8); val sy = y.take(8)
      val expected = math.signum(sx.compareTo(sy))
      val got = math.signum(java.lang.Long.compare(packs(x), packs(y)))
      assert(got == expected, s"order('$x' vs '$y')")
    }
    val n = Seq((null: String, 0)).toDF("s", "i")
      .select(expr("graft_pack7(s, i)")).collect()
    assert(n.head.isNullAt(0))
  }
}
