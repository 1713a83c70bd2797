package graft.ops.llm

import graft.SparkSpec

/** Laws for the trained-classifier pack and the incremental dedup: the
  * gates hash-match a DuckDB replay, so these pin the *semantic* claims
  * the replay can't distinguish from coincidence — conservation between
  * train and profile, exactly-one prediction per held-out doc, and the
  * three incremental-dedup paths (new / cross-batch dup / in-batch dup)
  * each leaving their distinct evidence.
  */
class ClassifySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("nbc profile conserves the training split's token mass and " +
       "carries one total per class") {
    import spark.implicits._
    val prof = Classify.nbcProfile(spark, dir).collect()
    assert(prof.nonEmpty)
    // lang_tot is constant within a class and equals the sum of its cnt
    prof.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val tots = rows.map(_.getLong(3)).distinct
      assert(tots.length === 1)
      assert(tots.head === rows.map(_.getLong(2)).sum)
    }
    // profile tokens come from TRAIN docs only: total mass must equal
    // the train split's token count
    val trainTokens = graft.Tables.documents(spark, dir)
      .filter($"doc_id" % 5 =!= 4)
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split($"text", " ")).cast("long"))
      .as[Long].collect().sum
    val profMass = prof.groupBy(_.getString(0))
      .map(_._2.head.getLong(3)).sum
    assert(profMass === trainTokens)
  }

  test("nbc confusion matrix covers every held-out doc exactly once " +
       "and only held-out docs") {
    import spark.implicits._
    val nTest = graft.Tables.documents(spark, dir)
      .filter($"doc_id" % 5 === 4).count()
    val conf = Classify.nbcConfusion(spark, dir).collect()
    assert(conf.map(_.getLong(2)).sum === nTest)
    // predictions are trained class labels (never 'und' on this fixture:
    // the shared vocabulary guarantees evidence for every doc)
    val langs = Set("de", "en", "es", "fr", "zh")
    conf.foreach { r =>
      assert(langs.contains(r.getString(0)))
      assert(langs.contains(r.getString(1)))
    }
  }

  test("nbc calibration: bins partition the held-out split, correctness " +
       "mass equals the confusion diagonal, and confidence ranges nest " +
       "inside their bins") {
    import spark.implicits._
    val nTest = graft.Tables.documents(spark, dir)
      .filter($"doc_id" % 5 === 4).count()
    val cal = Classify.nbcCalibration(spark, dir).collect()
    assert(cal.map(_.getLong(1)).sum === nTest)
    val diag = Classify.nbcConfusion(spark, dir).collect()
      .filter(r => r.getString(0) == r.getString(1)).map(_.getLong(2)).sum
    assert(cal.map(_.getLong(2)).sum === diag)
    cal.foreach { r =>
      val (bin, lo, hi) = (r.getLong(0), r.getDouble(3), r.getDouble(4))
      assert(lo <= hi)
      // fixed-width bins: conf range lies inside [bin/500, (bin+1)/500]
      // (the top bin also holds conf = 1.0 by the cap)
      assert(lo >= bin / 500.0 - 1e-12, s"bin $bin lo $lo")
      assert(hi <= (bin + 1) / 500.0 + 1e-12 ||
             (bin == 499 && hi <= 1.0 + 1e-12), s"bin $bin hi $hi")
    }
  }

  test("roc sweep: confusion rows are conservative and monotone in the " +
       "threshold") {
    val rows = Classify.nbcRoc(spark, dir).collect()
    assert(rows.nonEmpty)
    val p = rows.head.getLong(1) + rows.head.getLong(3) // tp + fn
    val n = rows.head.getLong(2) + rows.head.getLong(4) // fp + tn
    assert(p > 0 && n > 0)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(3) === p) // every threshold sees all positives
      assert(r.getLong(2) + r.getLong(4) === n)
    }
    // ascending bins = stricter thresholds: tp, fp, recall never increase
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(1) <= a.getLong(1), s"tp rose at bin ${b.getLong(0)}")
      assert(b.getLong(2) <= a.getLong(2), s"fp rose at bin ${b.getLong(0)}")
      assert(b.getLong(6) <= a.getLong(6), s"recall rose at bin ${b.getLong(0)}")
    }
    // the loosest threshold accepts everything: recall 100%, precision =
    // the base rate
    val loosest = rows.minBy(_.getLong(0))
    assert(loosest.getLong(1) === p && loosest.getLong(2) === n)
    assert(loosest.getLong(6) === 1000000L)
    assert(loosest.getLong(5) === 1000000L * p / (p + n))
  }

  test("incremental dedup: new docs survive, re-crawls drop against the " +
       "index, in-batch copies collapse to keep-lowest-id") {
    val out = Dedup.dedupIncremental(spark, dir).collect()
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sf0.01 has doc_ids 0..499: survivors are exactly the 100 new docs
    assert(out.length === 100)
    assert(byId.keySet === (400L until 500L).toSet)
    // the doubled 400..419 slice collapsed in-batch (n=2, kept original id)
    (400L until 420L).foreach(id => assert(byId(id) === 2L, s"id $id"))
    (420L until 500L).foreach(id => assert(byId(id) === 1L, s"id $id"))
  }
}
