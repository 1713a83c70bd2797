package graft.ops.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Semantic laws for the curation pack on handcrafted corpora — the
  * properties the DuckDB gate can't state directly (coverage, overlap,
  * removal completeness, score ordering).
  */
class CurationSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // 100 distinct tokens so a 32-token window never straddles a repeat
  private def longText(n: Int): String = (0 until n).map(i => s"t$i").mkString(" ")

  test("chunking covers every token: union of [start,end) spans = [0,n), " +
       "interior chunks overlap by window - stride") {
    val out = Curation.chunkingFrom(docs(1L -> longText(100), 2L -> longText(10)))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(1)))
    for ((id, n) <- Seq(1L -> 100L, 2L -> 10L)) {
      val spans = out.filter(_._1 == id).map(t => (t._2, t._3)).sorted
      assert(spans.head._1 == 0L)
      assert(spans.last._2 == n, s"doc $id last span ${spans.last} != n=$n")
      // each next chunk starts strictly inside the previous (overlap > 0)
      spans.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 < e1, s"gap at $s2 >= $e1")
        case _                       => ()
      }
    }
    // interior chunks are exactly the window wide and stride apart
    val interior = out.filter(t => t._1 == 1L && t._3 < 100L)
    interior.sliding(2).foreach {
      case Array((_, s1, _, _), (_, s2, _, _)) => assert(s2 - s1 == 24L)
      case _                                   => ()
    }
    assert(interior.forall(t => t._3 - t._2 == 32L))
  }

  test("chunking of a short doc is exactly one chunk = the whole doc") {
    val out = Curation.chunkingFrom(docs(7L -> "a b c")).collect()
    assert(out.length == 1)
    assert(out.head.getLong(3) == 0L && out.head.getLong(4) == 3L)
  }

  test("boilerplate removes ALL occurrences of a cross-doc segment " +
       "(unlike paraDedup's keep-first) and keeps unique segments") {
    // 10-word segment shared by docs 1 and 2; each doc's remainder and
    // doc 3 are unique segments (df = 1)
    val banner = (0 until 10).map(i => s"b$i").mkString(" ")
    val tailA  = (0 until 10).map(i => s"u$i").mkString(" ")
    val out = Curation.boilerplateFrom(docs(
        1L -> s"$banner $tailA",
        2L -> s"$banner ${(20 until 30).map(i => s"t$i").mkString(" ")}",
        3L -> longText(10)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toList
    assert(out.map(t => (t._2, t._3)) == List((2L, 1L), (2L, 1L), (1L, 0L)))
    // the md5 of doc 1's residue is md5(tailA) — same as a doc that was
    // born without the banner
    val cleanTail = Curation.boilerplateFrom(docs(9L -> tailA))
      .collect().head.getString(3)
    assert(out(0)._4 == cleanTail, "doc 1 residue should be exactly tailA")
    assert(out(1)._4 != cleanTail)
  }

  test("boilerplate: internal repetition within ONE doc does not count " +
       "as cross-document frequency") {
    val seg = (0 until 10).map(i => s"r$i").mkString(" ")
    val out = Curation.boilerplateFrom(docs(1L -> s"$seg $seg"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toList == List((2L, 0L)), "df counts docs, not occurrences")
  }

  test("perplexity: a document of corpus-common bigrams scores lower " +
       "(more predictable) than one of corpus-rare bigrams") {
    // 'x y' appears in 11 docs; 'p q' pairs only once each
    val common = (1L to 10L).map(i => i -> "x y x y x y")
    val out = Curation.perplexityFrom(docs(common :+ (20L -> "x y p q"): _*))
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(1L) < out(20L),
      s"common-bigram doc must be more predictable: ${out(1L)} vs ${out(20L)}")
  }

  test("bpe learns the textbook merge sequence (counts weighted by word " +
       "frequency, ties broken lexicographically)") {
    // corpus: abab ×2, abc ×1 → (a,b) appears 2/word in abab + 1 in abc = 5
    val out = Curation.bpeMergesFrom(docs(1L -> "abab abab abc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toList
    assert(out == List((1L, "a", "b", 5L), (2L, "ab", "ab", 2L), (3L, "ab", "c", 1L)),
      out.toString) // then exhausted: early-stop before BpeIters
  }

  test("bpe merge application is non-overlapping left-to-right: 'aaaa' " +
       "merges to two 'aa', counting (a,a) = 3 occurrences first") {
    val out = Curation.bpeMergesFrom(docs(1L -> "aaaa"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toList
    // round 1: pairs (a,a)×3 → merge; state ' aa  aa ' (NOT ' aa a a ')
    // round 2: (aa,aa)×1 — only possible if BOTH adjacent pairs merged
    assert(out == List(("a", "a", 3L), ("aa", "aa", 1L)), out.toString)
  }

  test("bpe encode: a fully-merged vocab reaches fertility 1 (every word " +
       "one symbol after merges a+b, ab+ab, ab+c)") {
    import spark.implicits._
    val corpus = Seq((1L, "abab abab abc", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Curation.bpeEncodeFrom(corpus).collect().head
    assert(out.getLong(1) == 3L)                 // 3 whitespace tokens
    assert(out.getLong(2) == 3L)                 // all three words → 1 symbol
    assert(out.getLong(3) == 11L)                // 4+4+3 chars
    assert(out.getDouble(4) == 1.0)              // fertility
    assert(out.getDouble(5) == 11.0 / 3.0)       // chars per symbol
  }

  test("trigram backoff: seen trigrams score via the trigram path, " +
       "wholly-unseen text backs off (or zeroes) — split replayed from " +
       "the same hash the operator uses") {
    // predict split membership with the operator's own hash rule
    def isEval(id: Long) =
      java.lang.Math.floorMod(CrossHash.hex60Jvm(s"$id#split"), 100L) >= 80
    val ids = (1L to 200L)
    val trainIds = ids.filterNot(isEval).take(3)
    val evalIds  = ids.filter(isEval).take(2)
    assert(trainIds.size == 3 && evalIds.size == 2, "split probe failed")
    val corpus = docs(
      (trainIds.map(_ -> "a b c d") ++
       Seq(evalIds(0) -> "a b c d",     // every trigram seen in train
           evalIds(1) -> "p q r s")): _*) // nothing seen anywhere in train
    val out = Curation.trigramBackoffFrom(corpus)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // seen doc: 2 trigrams, no backoff, deterministic c3/c2 = 3/3 → 1000 each
    assert(out(evalIds(0)) == ((2L, 0L, 2000L)), out.toString)
    // unseen doc: every trigram backs off, and even the backoff bigrams
    // are unseen → score 0
    assert(out(evalIds(1)) == ((2L, 2L, 0L)), out.toString)
  }

  test("tokenizeWith replays training segmentations and runs UNCHANGED " +
       "in a streaming select (batch-train / stream-apply)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = docs(1L -> "abab abab abc")
    val merges = Curation.bpeMergesFrom(corpus)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // batch: applying the merges to the raw words reproduces training
    val batch = corpus
      .select(explode(split($"text", " ")).as("word")).distinct()
      .select($"word", Curation.tokenizeWith($"word", merges).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(batch("abab") == List("abab") && batch("abc") == List("abc"), batch.toString)

    // streaming: the SAME expression in a readStream→select, no state
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    mem.addData("abab", "abc", "ab")
    val q = mem.toDF().select(
        Curation.tokenizeWith($"value", merges).as("syms"))
      .writeStream.format("memory").queryName("graft_tok_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("graft_tok_stream")
      .collect().map(_.getSeq[String](0).toList).toSet
    assert(streamed == Set(List("abab"), List("abc"), List("ab")), streamed.toString)
  }

  test("perplexity proxy of a perfectly deterministic corpus is exactly 1") {
    // every prefix has exactly one continuation: c1(w) == c2(w, next)
    val out = Curation.perplexityFrom(docs(1L -> "a b c", 2L -> "a b c"))
      .collect().map(_.getDouble(4))
    assert(out.forall(_ == 1.0), out.toList.toString)
  }
}
