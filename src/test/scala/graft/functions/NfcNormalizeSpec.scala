package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_nfc must implement UAX #15 canonical composition (matching
  * DuckDB's independent nfc_normalize — the gate proves that), be the
  * identity on ASCII and on already-composed text, and be null-correct.
  */
class NfcNormalizeSpec extends SparkSpec {

  private def reg(): Unit = GraftFunctions.register(spark)

  test("composes decomposed sequences; identity on ASCII and NFC text") {
    reg(); import spark.implicits._
    val decomposedE = "é"     // e + combining acute
    val composedE   = "é"      // é precomposed
    val rows = Seq(
      ("plain ascii", "plain ascii"),
      (s"caf$decomposedE", s"caf$composedE"),      // composes
      (s"caf$composedE", s"caf$composedE"),        // already NFC: identity
      ("naïve", "naïve"),               // i + diaeresis → ï
      ("", ""),
      ("́", "́")                         // lone combining mark
    ).toDF("s", "expect")
    val bad = rows.select(expr("graft_nfc(s)").as("got"), $"expect")
      .where($"got" =!= $"expect").count()
    assert(bad == 0L)
  }

  test("null in, null out; code-point length shrinks on composition") {
    reg(); import spark.implicits._
    val r = Seq((null: String, "é")).toDF("n", "d")
      .select(expr("graft_nfc(n)").as("n2"),
        length(col("d")).as("lenRaw"),
        length(expr("graft_nfc(d)")).as("lenNfc"))
      .collect()(0)
    assert(r.isNullAt(0))
    assert(r.getInt(1) == 2 && r.getInt(2) == 1)
  }
}
