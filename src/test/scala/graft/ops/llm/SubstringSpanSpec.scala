package graft.ops.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Span semantics of [[Dedup.substringSpansFrom]] pinned on planted
  * documents where every span boundary is known by construction: the
  * operator must report EXACT merged-span extents — overlapping gram
  * hits coalesce, hits separated by more than the gram width do not,
  * within-doc repetition alone never creates a span (df is counted in
  * DISTINCT documents), and a document with no cross-doc duplication
  * is absent from the report.
  */
class SubstringSpanSpec extends SparkSpec {

  import spark.implicits._

  private val k = 24 // must mirror Dedup.SpanGram

  // Unique filler: no two filler regions share any k-gram, and two
  // fillers with different tags differ at their very FIRST character
  // (span extents are asserted to the exact passage boundary, so even a
  // single shared char straddling the edge would widen a span — the
  // k-gram detector is defined over raw chars, not token boundaries).
  private def filler(tag: Int, n: Int): String =
    Iterator.from(0).map(i => s"${('a' + tag).toChar}$tag-$i ")
      .flatten.take(n).mkString

  private val sharedA = "the quick brown fox jumps over the lazy dog again" // 49 chars
  private val sharedB = "pack my box with five dozen liquor jugs tonight ok" // 50 chars

  private def frame(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("two shared passages separated by > k unique chars become two " +
       "exact spans; contiguous duplication merges into one") {
    // doc 1: [sharedA][40 filler][sharedB] — two spans
    // doc 2: [sharedA][sharedB] back-to-back — hits chain across the
    //        junction only if a junction gram is itself duplicated; it
    //        is not (doc 1's junction differs), but the gap between the
    //        last hit of A and first hit of B is <= k, so they MERGE —
    //        the fixed-width merge rule, asserted exactly below
    val d1 = sharedA + filler(1, 40) + sharedB
    val d2 = sharedA + sharedB
    val out = Dedup.substringSpansFrom(frame(1L -> d1, 2L -> d2))
      .select($"doc_id", $"n_spans", $"chars_dup", $"first_s", $"last_e")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, n, c, s, e) => id -> ((n, c, s, e)) }.toMap
    // doc 1: span 1 = all of sharedA [0, 49); span 2 = all of sharedB
    // [89, 139). Both passages are fully covered (every position of the
    // shared text starts or is inside a duplicated gram).
    assert(out(1L) === ((2L, 99L, 0L, d1.length.toLong)))
    // doc 2: last hit of A starts at 49-k=25, first hit of B at 49 —
    // gap 24 <= k, so ONE span [0, 99)
    assert(out(2L) === ((1L, 99L, 0L, 99L)))
  }

  test("within-doc repetition alone is NOT a duplicated span (df counts " +
       "distinct docs) and unduplicated docs are absent") {
    val rep = sharedA + sharedA // same passage twice, but only one doc
    val out = Dedup.substringSpansFrom(
      frame(1L -> rep, 2L -> filler(2, 120), 3L -> filler(3, 120)))
    assert(out.count() === 0)
  }

  test("null and too-short texts are filtered, never NPE: a null-text " +
       "doc can neither carry nor induce spans") {
    val rows = Seq[(Long, String)](
      1L -> null, 2L -> sharedA, 3L -> sharedA, 4L -> "tiny")
    val det = Dedup.substringSpansFrom(rows.toDF("doc_id", "text"))
      .select($"doc_id").as[Long].collect().sorted
    assert(det === Array(2L, 3L)) // only the real twins
    val exc = Dedup.substringExciseFrom(rows.toDF("doc_id", "text"))
      .select($"doc_id").as[Long].collect().sorted
    assert(exc === Array(2L, 3L))
  }

  test("a shared passage shorter than k chars is invisible") {
    val tiny = "identical-short-bit " // 20 chars < k
    val out = Dedup.substringSpansFrom(
      frame(1L -> (tiny + filler(1, 100)), 2L -> (tiny + filler(2, 100))))
    assert(out.count() === 0)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("excision removes exactly the spans: cleaned text = unique " +
       "context stitched back together; a fully-duplicated doc reports " +
       "an empty reconstruction") {
    val d1 = filler(1, 60) + sharedB + filler(5, 60)   // middle span
    val d2 = filler(2, 30) + sharedB + filler(6, 90)   // middle span
    val d3 = sharedA                                    // fully duplicated…
    val d4 = sharedA                                    // …with its twin
    val out = Dedup.substringExciseFrom(
        frame(1L -> d1, 2L -> d2, 3L -> d3, 4L -> d4))
      .select($"doc_id", $"n_cut", $"chars_cut", $"clean_len", $"clean_md5")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val clean1 = filler(1, 60) + filler(5, 60)
    val clean2 = filler(2, 30) + filler(6, 90)
    assert(out(1L) === ((1L, 50L, 120L, md5hex(clean1))))
    assert(out(2L) === ((1L, 50L, 120L, md5hex(clean2))))
    assert(out(3L) === ((1L, 49L, 0L, md5hex(""))))
    assert(out(4L) === ((1L, 49L, 0L, md5hex(""))))
  }

  test("excision with spans touching BOTH doc edges keeps only the " +
       "middle unique segment") {
    // doc 1/2: [sharedA][unique middle][sharedB] — spans at both edges.
    // Middle lengths cut mid-token (51/81, not 50/80): a filler ending
    // at a token boundary ends in ' ' in BOTH docs, which duplicates
    // the gram straddling the middle→sharedB edge and widens the span
    // by that one shared char (caught live, same class as the 'u1'
    // prefix note above).
    val d1 = sharedA + filler(1, 51) + sharedB
    val d2 = sharedA + filler(2, 81) + sharedB
    val out = Dedup.substringExciseFrom(frame(1L -> d1, 2L -> d2))
      .select($"doc_id", $"n_cut", $"clean_len", $"clean_md5")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((2L, 51L, md5hex(filler(1, 51)))))
    assert(out(2L) === ((2L, 81L, md5hex(filler(2, 81)))))
  }

  test("span extents cover exactly the shared passage when embedded in " +
       "unique context on both sides") {
    // tags must differ in their FIRST char (filler(11)/filler(12) share
    // the "u1" prefix, which re-duplicates the gram straddling sharedB's
    // trailing edge and legitimately widens the span by 2 — caught live)
    val d1 = filler(1, 60) + sharedB + filler(5, 60)
    val d2 = filler(2, 30) + sharedB + filler(6, 90)
    val out = Dedup.substringSpansFrom(frame(1L -> d1, 2L -> d2))
      .select($"doc_id", $"first_s", $"last_e")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((60L, 60L + sharedB.length)))
    assert(out(2L) === ((30L, 30L + sharedB.length)))
  }

  /** Brute-force twin for [[Dedup.longestDupSubstringFrom]]: every
    * substring of every doc, hashed into a multiset — the naive O(n²·L)
    * answer the rolling-hash binary search must reproduce exactly.
    */
  private def bruteLongestDup(texts: Seq[(Long, String)])
      : (Int, Map[String, (Long, Long)]) = {
    val all = texts.flatMap { case (d, s) =>
      s.indices.flatMap(i => (i + 1 to s.length).map(j => (s.substring(i, j), d)))
    }
    val groups = all.groupBy(_._1).filter(_._2.size >= 2)
    if (groups.isEmpty) (0, Map.empty)
    else {
      val lmax = groups.keys.map(_.length).max
      val top = groups.filter(_._1.length == lmax)
      (lmax, top.map { case (g, occ) =>
        g -> ((occ.size.toLong, occ.map(_._2).distinct.size.toLong))
      })
    }
  }

  test("longest duplicated substring: exact answer on planted corpora — " +
       "cross-doc repeat, within-doc repeat, ties at the max length, " +
       "and the shorter-runner-up is NOT reported") {
    val corpora = Seq(
      // cross-doc 31-char repeat (the max), within-doc shorter repeat
      Seq(1L -> s"${filler(0, 40)}common passage shared by both x${filler(1, 40)}",
          2L -> s"${filler(2, 40)}common passage shared by both x${filler(3, 40)}",
          3L -> s"${filler(4, 30)}echo echo${filler(5, 30)}"),
      // tie: two DIFFERENT substrings of the same max length duplicated
      Seq(10L -> s"${filler(0, 30)}alpha beta gamma del${filler(1, 30)}",
          11L -> s"${filler(2, 30)}alpha beta gamma del${filler(3, 30)}",
          12L -> s"${filler(4, 30)}omega sigma kappa ta${filler(5, 30)}",
          13L -> s"${filler(6, 30)}omega sigma kappa ta${filler(7, 30)}"),
      // within-ONE-doc repeat only (both occurrences in the same doc)
      Seq(20L -> s"zqjxkv repeated block here! ${filler(0, 25)} repeated block here! wvm"),
      // dup ending at the very LAST character of both docs — regression
      // for the probe's offset-rank window near the validity boundary
      // (an offset lead computed AFTER the validity filter reads a
      // trimmed row here and silently loses the collision)
      Seq(30L -> s"${filler(0, 28)}final shared tail block!",
          31L -> s"${filler(1, 28)}final shared tail block!")
    )
    corpora.foreach { texts =>
      val (lmaxExp, topExp) = bruteLongestDup(texts)
      val got = Dedup.longestDupSubstringFrom(texts.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      assert(got.forall(_._1 == lmaxExp.toLong),
        s"lmax: got ${got.map(_._1).toSeq} expected $lmaxExp")
      val gotMap = got.map(r => r._2 -> ((r._3, r._4))).toMap
      assert(gotMap === topExp, s"groups at lmax=$lmaxExp")
    }
  }
}
