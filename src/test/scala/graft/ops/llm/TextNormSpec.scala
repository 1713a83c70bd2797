package graft.ops.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the text-normalization tier. The gates hash-match a DuckDB
  * replay of the same planting + repair, which proves cross-engine
  * agreement but not the semantic properties a pipeline relies on; those
  * are pinned here: the repair chain is idempotent (safe to re-run over a
  * partially-cleaned corpus), repaired text is actually free of the
  * defect classes, the planted-defect census follows the doc_id
  * arithmetic exactly, and sentence counts follow the every-8th-word
  * planting law against an independent word-count derivation.
  */
class TextNormSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("mojibake repair is idempotent and leaves no residual defects") {
    import spark.implicits._
    // re-plant the same defect corpus the op uses, then compare one
    // repair pass against two
    val planted = TextStats.mojibakeFix(spark, dir) // forces compile path
    assert(planted.count() > 0)
    val zw = "\u200b"; val shy = "\u00ad"; val bom = "\ufeff"
    val vt = "\u000b"
    val docs = graft.Tables.documents(spark, dir)
      .withColumn("t2",
        when($"doc_id" % 7 === 0,
          concat($"text", lit(" itâ€™s a cafÃ© â€” ok"))).otherwise($"text"))
      .withColumn("t2",
        when($"doc_id" % 11 === 0,
          concat(lit(bom), $"t2", lit(s" zero${zw}width soft${shy}hyphen")))
          .otherwise($"t2"))
      .withColumn("t2",
        when($"doc_id" % 13 === 0, concat($"t2", lit(s"${vt}tail")))
          .otherwise($"t2"))
      .withColumn("once", TextStats.repairEncoding($"t2"))
      .withColumn("twice", TextStats.repairEncoding($"once"))
    assert(docs.filter($"once" =!= $"twice").count() === 0L)
    // no mojibake sequences, invisibles, or C0 controls survive repair
    val residual = docs.filter(
      size(regexp_extract_all($"once", lit(TextStats.mojiPat), lit(0))) > 0 ||
      size(regexp_extract_all($"once", lit(TextStats.invPat), lit(0))) > 0 ||
      size(regexp_extract_all($"once", lit(TextStats.ctlPat), lit(0))) > 0)
    assert(residual.count() === 0L)
  }

  test("mojibake census follows the doc_id planting arithmetic") {
    import spark.implicits._
    val out = TextStats.mojibakeFix(spark, dir)
      .agg(sum($"n_docs").as("d"), sum($"n_docs_mojibake").as("dm"),
           sum($"n_mojibake").as("m"), sum($"n_invisible").as("i"),
           sum($"n_control").as("c"))
      .head()
    val n = graft.Tables.documents(spark, dir).count()
    val m7  = (0L until n).count(_ % 7 == 0)
    val m11 = (0L until n).count(_ % 11 == 0)
    val m13 = (0L until n).count(_ % 13 == 0)
    assert(out.getLong(0) === n)
    assert(out.getLong(1) === m7)      // only %7 docs carry mojibake
    assert(out.getLong(2) === 3L * m7) // â€™ + Ã© + â€” per planted doc
    assert(out.getLong(3) === 3L * m11) // BOM + zwsp + soft hyphen
    assert(out.getLong(4) === m13)      // one VT per planted doc
  }

  test("luhn validator separates the planted valid PAN from its bumped " +
       "lookalike exactly") {
    import spark.implicits._
    val out = TextStats.piiLuhn(spark, dir)
      .agg(sum($"n_docs").as("d"), sum($"n_candidates").as("c"),
           sum($"n_valid").as("v"), sum($"n_luhn_rejects").as("r"))
      .head()
    val n = graft.Tables.documents(spark, dir).count()
    val m7  = (0L until n).count(_ % 7 == 0)  // planted valid cards
    val m11 = (0L until n).count(_ % 11 == 0) // planted luhn-failing runs
    assert(out.getLong(0) === n)
    assert(out.getLong(1) === m7 + m11) // corpus itself is digit-free
    assert(out.getLong(2) === m7)
    assert(out.getLong(3) === m11)
  }

  test("prefix-doubling suffix array matches the textbook example and " +
       "the naive sort on fixture docs") {
    import spark.implicits._
    // banana: suffixes sorted are a(5) ana(3) anana(1) banana(0) na(4)
    // nana(2)
    val tiny = Seq((0L, "banana")).toDF("doc_id", "text")
    val sa = TextStats.suffixRanks(tiny).collect()
      .sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    assert(sa === Seq(5L, 3L, 1L, 0L, 4L, 2L))
    // independent naive check on a fixture doc: ranks must order the
    // actual suffix strings
    val doc = graft.Tables.documents(spark, dir)
      .where($"doc_id" === 7L).select($"text").head().getString(0)
    val got = TextStats.suffixRanks(
        Seq((7L, doc)).toDF("doc_id", "text")).collect()
      .sortBy(_.getLong(1)).map(_.getLong(2).toInt).toSeq
    val naive = doc.indices.sortBy(doc.substring(_)).toSeq
    assert(got === naive)
  }

  test("suffix array property: 50 seeded-random strings + adversarial " +
       "tie cases all match the naive sort in one pass") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val adversarial = Seq("a", "aaaaaaaaaa", "abababababab", "banana",
      "zyxwvutsrq", "aab aba baa")
    val strings = adversarial ++ (0 until 50).map { _ =>
      val n = 1 + rnd.nextInt(60)
      (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }
    val df = strings.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    val got = TextStats.suffixRanks(df).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(_.getLong(2).toInt).toSeq
      }
    strings.zipWithIndex.foreach { case (s, i) =>
      val naive = s.indices.sortBy(s.substring(_)).toSeq
      assert(got(i.toLong) === naive, s"doc $i: '$s'")
    }
  }

  test("corpus-global suffix array: dense global ranks match the naive " +
       "sort, identical cross-doc suffixes tie, and the result is " +
       "invariant to the shuffle-partition count (the bucket width " +
       "derives from it)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val strings = Seq(
      "banana", "banana",            // full-doc twins: every suffix ties
      "the quick brown fox", "the quick brown fox jumps",
      "aaaaaaaaaaaaaaaaaaaaaaaa",    // >16 chars of one symbol: seed ties
      "a") ++ (0 until 40).map { _ =>
      val n = 1 + rnd.nextInt(50)
      (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }
    val df = strings.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
    // naive: every (doc, pos) suffix, globally sorted, dense-ranked
    val sufs = strings.zipWithIndex.flatMap { case (s, i) =>
      s.indices.map(j => (i.toLong, j.toLong, s.substring(j)))
    }
    val order = sufs.map(_._3).distinct.sorted.zipWithIndex
      .map { case (s, k) => s -> (k + 1L) }.toMap
    val expected = sufs.map { case (d, j, s) => (d, j, order(s)) }.toSet
    def run(): Set[(Long, Long, Long)] =
      TextStats.suffixRanksGlobal(df).collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).toSet
    assert(run() === expected)
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "3")
      assert(run() === expected, "result depends on the partition count")
    } finally spark.conf.set(key, prev)
  }

  test("sentence counts follow the every-8th-word planting law") {
    import spark.implicits._
    // independent derivation: a doc with nw words gets one planted '.'
    // per full 8-word block that still has a following word, so
    // n_sent = (nw - 1) div 8 + 1
    val expected = graft.Tables.documents(spark, dir)
      .select($"lang", size(split($"text", " ")).cast("long").as("nw"))
      .groupBy($"lang")
      .agg(sum(expr("(nw - 1) div 8 + 1")).as("exp_sentences"),
           max(expr("(nw - 1) div 8 + 1")).as("exp_max"))
    val got = TextStats.sentenceStats(spark, dir)
      .select($"lang", $"n_sentences", $"max_sent_per_doc")
    val joined = got.join(expected, Seq("lang"))
    assert(joined.filter($"n_sentences" =!= $"exp_sentences" ||
                         $"max_sent_per_doc" =!= $"exp_max").count() === 0L)
    assert(joined.count() === 5L)
  }
}
