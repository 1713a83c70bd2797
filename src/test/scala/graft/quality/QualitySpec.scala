package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The expectation layer's semantics on crafted data: pass/fail per
  * check type, NULL handling (tolerated by domain checks, hostile in
  * predicates), and the one-pass cost claim.
  */
class QualitySpec extends SparkSpec {

  import spark.implicits._
  import Expectations._

  private def fixture = Seq(
    (1L, 1, "A", 10.0),
    (1L, 2, "N", 0.0),
    (2L, 1, "R", 5.5)
  ).toDF("k", "ln", "flag", "qty")

  private def byName(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getBoolean(1), r.getLong(2), r.getLong(3)))).toMap

  test("clean data passes every check type") {
    val rep = byName(report(fixture, Seq(
      RowCountBetween(1, 10), NotNull("k"), Unique(Seq("k", "ln")),
      ValuesIn("flag", Seq("A", "N", "R")), NonNegative("qty"),
      Predicate("qty_small", $"qty" < 100))))
    assert(rep.size === 6)
    assert(rep.values.forall(_._1 === true), rep)
    assert(rep("row_count_between_1_10")._2 === 3L)
    assert(rep.values.forall(_._3 === 3L))
  }

  test("violations fail their check and count violations, not rows") {
    val dirty = fixture.union(Seq((2L, 1, "X", -1.0)).toDF)
    val rep = byName(report(dirty, Seq(
      Unique(Seq("k", "ln")), ValuesIn("flag", Seq("A", "N", "R")),
      NonNegative("qty"), RowCountBetween(1, 3))))
    assert(rep("unique_k_ln") === ((false, 3L, 4L))) // 3 distinct of 4
    assert(rep("values_in_flag") === ((false, 1L, 4L))) // 1 bad value
    assert(rep("non_negative_qty") === ((false, 1L, 4L)))
    assert(rep("row_count_between_1_3")._1 === false)
  }

  test("NULLs: tolerated by domain checks, counted by NotNull, hostile " +
       "in predicates") {
    val withNull = Seq((Some(1L), Some("A"), Some(1.0)),
                       (None, None, None))
      .toDF("k", "flag", "qty")
    val rep = byName(report(withNull, Seq(
      NotNull("k"), ValuesIn("flag", Seq("A")), NonNegative("qty"),
      Predicate("qty_pos", $"qty" > 0))))
    assert(rep("not_null_k") === ((false, 1L, 2L)))
    assert(rep("values_in_flag")._1 === true)  // NULL not a domain breach
    assert(rep("non_negative_qty")._1 === true)
    assert(rep("qty_pos") === ((false, 1L, 2L))) // NULL predicate = breach
  }

  test("N checks fold into ONE scan (adding a check adds no pass)") {
    val p = report(fixture, Seq(
      RowCountBetween(1, 10), NotNull("k"), ValuesIn("flag", Seq("A", "N", "R")),
      NonNegative("qty"), Predicate("a", $"qty" < 100),
      Predicate("b", $"qty" > -100)))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(p).size == 1, p)
  }

  test("duplicate check names are rejected") {
    intercept[IllegalArgumentException] {
      report(fixture, Seq(NotNull("k"), NotNull("k")))
    }
  }
}
