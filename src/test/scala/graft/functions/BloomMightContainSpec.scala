package graft.functions

import java.io.ByteArrayOutputStream

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** graft_bloom_might_contain must agree row-for-row with the sketch's
  * own `mightContainString` (in particular: NO false negatives for
  * inserted keys), be null-correct, reject non-foldable filter args at
  * analysis, and run codegen'd (no ScalaUDF fallback — the PlanSpec pin
  * covers the gate's plan; this spec covers the expression contract).
  */
class BloomMightContainSpec extends SparkSpec {

  private def serialized(bf: BloomFilter): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    bf.writeTo(baos)
    baos.toByteArray
  }

  test("agrees with BloomFilter.mightContainString; no false negatives") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val bf = BloomFilter.create(100, 0.03)
    val inserted = (0 until 50).map(i => s"key-$i")
    inserted.foreach(bf.putString)
    val probes = (0 until 200).map(i => s"key-$i")
    val got = probes.toDF("k")
      .select($"k", call_function("graft_bloom_might_contain",
        lit(serialized(bf)), $"k").as("maybe"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    probes.foreach { k =>
      assert(got(k) === bf.mightContainString(k),
        s"$k: expression disagrees with the sketch")
    }
    inserted.foreach(k => assert(got(k), s"$k: FALSE NEGATIVE on inserted key"))
  }

  test("null value in, null out") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val bf = BloomFilter.create(10, 0.03)
    bf.putString("x")
    val r = Seq(Some("x"), None).toDF("k")
      .select(call_function("graft_bloom_might_contain",
        lit(serialized(bf)), $"k").as("maybe"))
      .collect()
    assert(r(0).getBoolean(0) === true)
    assert(r(1).isNullAt(0))
  }

  test("non-foldable filter argument is rejected at analysis") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val e = intercept[AnalysisException] {
      Seq(("x".getBytes("UTF-8"), "x")).toDF("b", "k")
        .select(call_function("graft_bloom_might_contain", $"b", $"k"))
        .collect()
    }
    assert(e.getMessage.toUpperCase.contains("FOLDABLE"), e.getMessage)
  }
}
