package graft.ops.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the contrastive hard-negative miner: the label constraint
  * must be absolute (a same-label vector is never a negative, however
  * near), ranking must follow similarity, and the margin must expose
  * label-noise (negatives ranked above every positive go negative).
  */
class HardNegativesSpec extends SparkSpec {

  import spark.implicits._

  /** Deterministic synthetic corpus: 64-dim one-hot-ish vectors where
    * geometry is fully controlled. Query 0 (label 1) gets:
    *  - an IDENTICAL vector with the SAME label (vec 100, cos = 1) — the
    *    nearest vector overall, which must NOT appear as a negative;
    *  - a near-identical vector with a DIFFERENT label (vec 200) — the
    *    hardest negative, must rank 1 with a NEGATIVE margin iff it
    *    beats the best positive;
    *  - orthogonal-ish fillers of both labels.
    */
  private def corpus() = {
    def v(hot: Int, eps: Double): Seq[Double] =
      (0 until 64).map(d => if (d == hot) 1.0 else if (d == hot + 1) eps else 0.0)
    Seq(
      (0L,   1, v(0, 0.0)),   // query
      (100L, 1, v(0, 0.0)),   // identical, same label → positive, cos 1
      (200L, 2, v(0, 0.1)),   // near-identical, other label → hardest neg
      (201L, 2, v(5, 0.0)),   // orthogonal, other label
      (202L, 3, v(9, 0.3)),   // orthogonal, third label
      (101L, 1, v(7, 0.0))    // orthogonal, same label
    ).toDF("vec_id", "label", "v0")
      .select($"vec_id", $"label",
        expr("transform(v0, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
  }

  test("same-label vectors never appear as negatives (even the identical " +
       "one); negatives rank by cosine; pos_best is the best positive") {
    graft.functions.GraftFunctions.register(spark)
    val out = Similarity.hardNegativesFrom(corpus())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    val q0 = out.filter(_._1 == 0L)
    assert(q0.map(_._3).toSet === Set(200L, 201L, 202L),
      "negatives must be exactly the other-label vectors")
    assert(!q0.map(_._3).contains(100L) && !q0.map(_._3).contains(101L),
      "same-label vectors must never be mined as negatives")
    // rank 1 = the near-identical other-label vector
    assert(q0.find(_._2 == 1L).get._3 === 200L)
    // pos_best = cos(query, identical positive) = 1.0 exactly
    q0.foreach(r => assert(r._6 === 1.0))
    // margins: rank-1 margin = 1 − cos(q, 200) > 0 here (the positive is
    // identical, so nothing can beat it); monotone non-decreasing in rank
    val margins = q0.sortBy(_._2).map(_._7)
    assert(margins.zip(margins.tail).forall { case (a, b) => a <= b })
  }

  test("a negative ranked above every positive yields a NEGATIVE margin " +
       "(the label-noise flag), and a query with no same-label peer " +
       "yields null pos_best/margin") {
    graft.functions.GraftFunctions.register(spark)
    def v(hot: Int, eps: Double): Seq[Double] =
      (0 until 64).map(d => if (d == hot) 1.0 else if (d == hot + 1) eps else 0.0)
    val df = Seq(
      (1L, 7, v(0, 0.0)),    // query, label 7
      (300L, 8, v(0, 0.05)), // other label, nearly identical
      (301L, 7, v(9, 0.0)),  // same label, orthogonal (the weak positive)
      (2L, 9, v(20, 0.0)),   // query with a UNIQUE label
      (302L, 4, v(20, 0.1))  // its only neighbor, other label
    ).toDF("vec_id", "label", "v0")
      .select($"vec_id", $"label",
        expr("transform(v0, x -> cast(x as double))").as("v"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
    val rows = Similarity.hardNegativesFrom(df).collect()
    val r1 = rows.filter(_.getLong(0) == 1L)
      .find(_.getLong(1) == 1L).get
    assert(r1.getLong(2) === 300L)
    assert(r1.getDouble(6) < 0.0,
      "hardest negative beats the best positive → margin must be negative")
    val r2 = rows.filter(_.getLong(0) == 2L)
    assert(r2.nonEmpty)
    r2.foreach { r =>
      assert(r.isNullAt(5) && r.isNullAt(6),
        "unique-label query has no positive → null pos_best and margin")
    }
  }
}
