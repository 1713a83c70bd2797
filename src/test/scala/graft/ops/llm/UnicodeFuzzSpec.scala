package graft.ops.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized multilingual corpora against the byte-level suffix
  * machinery ([[SuffixIndex]] / longest-dup) — the fuzz complement to
  * [[UnicodeTextSpec]]'s fixed planted corpus (VERDICT r9 #1). The
  * planted corpus proves the chosen edge cases; these corpora prove the
  * cases nobody chose: random mixes of 1/2/3/4-byte scripts, combining
  * marks, shared prefixes, cross-script duplications planted at random
  * offsets, empty and sub-seed-width documents.
  *
  * Both references are INDEPENDENT driver-side computations on the raw
  * UTF-8 bytes (a plain byte-array suffix sort; an exhaustive
  * duplicated-gram scan) — no shared spelling with the engine.
  *
  * Documents are assembled from ATOMS (single code points or a full
  * combining sequence), and duplications are planted by copying atom
  * slices, so every generated string is well-formed UTF-16 — yet the
  * byte machinery still sees mid-character and cross-atom byte ties
  * (CJK atoms share lead bytes; the engine must handle byte-level ties
  * the generator never spells explicitly).
  */
class UnicodeFuzzSpec extends SparkSpec {

  import spark.implicits._

  private val pools: Vector[Vector[String]] = Vector(
    ('a' to 'z').toVector.map(_.toString),             // 1-byte ASCII
    "àâäçéèêëîïôöùûüÿñ".toVector.map(_.toString),      // 2-byte Latin
    "αβγδεζηθικλμνξοπ".toVector.map(_.toString),       // 2-byte Greek
    "абвгдежзийклмноп".toVector.map(_.toString),       // 2-byte Cyrillic
    "的一是不了人我在有他这为之大来以个中上们".toVector.map(_.toString), // 3-byte CJK
    "אבגדהוזחטיכלמנ".toVector.map(_.toString),         // RTL Hebrew
    "ابتثجحخدذرزسشص".toVector.map(_.toString),         // RTL Arabic
    Vector("é", "ä", "ô", "ñ"), // combining (NFD)
    Vector("🦀", "🚀", "🌍", // astral 4-byte
           "🧪", "𝒜")
  )

  /** One random corpus: ~26 random docs + planted cross-doc atom-slice
    * duplications + the deliberate degenerate docs (empty, single-atom,
    * exact-prefix pair).
    */
  private def genCorpus(seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    def atom(): String = {
      val p = pools(rnd.nextInt(pools.length))
      p(rnd.nextInt(p.length))
    }
    val base: Vector[Vector[String]] =
      Vector.fill(20)(Vector.fill(1 + rnd.nextInt(40))(atom()))
    // plant: copy a random atom slice of one doc into two others (and
    // once twice into the SAME doc — a within-doc dup), guaranteeing
    // duplicated byte runs long past the 14-byte seed width
    val planted = {
      var docs = base
      (0 until 4).foreach { _ =>
        val src = docs(rnd.nextInt(docs.length))
        if (src.nonEmpty) {
          val a = rnd.nextInt(src.length)
          val b = math.min(src.length, a + 3 + rnd.nextInt(12))
          val slice = src.slice(a, b)
          def splice(d: Vector[String]): Vector[String] = {
            val at = if (d.isEmpty) 0 else rnd.nextInt(d.length + 1)
            d.take(at) ++ slice ++ d.drop(at)
          }
          val i = rnd.nextInt(docs.length)
          val j = rnd.nextInt(docs.length)
          docs = docs.updated(i, splice(docs(i)))
          docs = docs.updated(j, splice(splice(docs(j))))
        }
      }
      docs
    }
    val strs = planted.map(_.mkString)
    val extras = Vector(
      "",                                       // empty doc
      atom(),                                   // below the seed width
      strs.head,                                // exact duplicate of doc 0
      strs.head.take(math.max(1, strs.head.length / 2)) // prefix of doc 0
    )
    (strs ++ extras).zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  private def byteOrd: Ordering[Array[Byte]] = new Ordering[Array[Byte]] {
    def compare(x: Array[Byte], y: Array[Byte]): Int = {
      val m = math.min(x.length, y.length)
      var i = 0
      while (i < m) {
        val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      java.lang.Integer.compare(x.length, y.length)
    }
  }

  /** Naive global dense byte-suffix ranks: (doc, bytePos) -> rank. */
  private def naiveRanks(corpus: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val ord = byteOrd
    val suffixes = corpus.flatMap { case (id, text) =>
      val b = text.getBytes("UTF-8")
      b.indices.map(i => (id, i.toLong, b.drop(i)))
    }
    val sorted = suffixes.sortBy(_._3)(ord)
    val out = scala.collection.mutable.Map[(Long, Long), Long]()
    var rank = 0L
    var prev: Array[Byte] = null
    sorted.foreach { case (id, i, suf) =>
      if (prev == null || ord.compare(prev, suf) != 0) rank += 1
      prev = suf
      out((id, i)) = rank
    }
    out.toMap
  }

  /** Naive longest duplicated byte string: exhaustive max-LCP over the
    * sorted suffixes, then every lmax-byte gram with >= 2 occurrences as
    * (lmax, lowercase-hex g, n_occ, n_docs) rows sorted by g.
    */
  private def naiveLongestDup(corpus: Seq[(Long, String)])
      : Seq[(Long, String, Long, Long)] = {
    val ord = byteOrd
    val byDoc = corpus.map { case (id, t) => id -> t.getBytes("UTF-8") }
    val sorted = byDoc.flatMap { case (id, b) =>
      b.indices.map(i => (id, i, b))
    }.sortBy { case (_, i, b) => b.drop(i) }(ord)
    def lcp(x: Array[Byte], xi: Int, y: Array[Byte], yi: Int): Int = {
      var k = 0
      while (xi + k < x.length && yi + k < y.length &&
             x(xi + k) == y(yi + k)) k += 1
      k
    }
    val lmax = sorted.sliding(2).collect {
      case Seq((_, i1, b1), (_, i2, b2)) => lcp(b1, i1, b2, i2)
    }.foldLeft(0)(math.max)
    if (lmax == 0) Seq.empty
    else {
      val grams = byDoc.flatMap { case (id, b) =>
        (0 to b.length - lmax).map(i =>
          (b.slice(i, i + lmax).map("%02x".format(_)).mkString, id))
      }
      grams.groupBy(_._1).toSeq
        .map { case (g, occ) =>
          (lmax.toLong, g, occ.size.toLong, occ.map(_._2).distinct.size.toLong)
        }
        .filter(_._3 >= 2L)
        .sortBy(_._2)
    }
  }

  // independent replica of the 60-bit md5 prefix (same spelling as
  // UnicodeTextSpec — BigInt fold, not the engine's bit-shift chain)
  private def hex60(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    BigInt(1, d.take(8)).toLong >>> 4
  }

  /** Naive winnow (k=8-byte grams, w=4 window): doc -> (n_fps, fp_head). */
  private def naiveWinnow(corpus: Seq[(Long, String)])
      : Map[Long, (Long, String)] = {
    val k = 8; val w = 4
    corpus.flatMap { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val n = b.length
      if (n < k + w - 1) None
      else {
        val hv = (0 to n - k).map(i => hex60(b.slice(i, i + k)))
        val wmins = (0 to n - k - (w - 1)).map(i => hv.slice(i, i + w).min)
        val fps = wmins.distinct.sorted
        Some(id -> (fps.size.toLong, fps.take(8).mkString("|")))
      }
    }.toMap
  }

  /** Naive CDC chunks (16-byte window, divisor 64): (doc, j, nb, md5). */
  private def naiveCdc(corpus: Seq[(Long, String)])
      : Set[(Long, Int, Int, String)] = {
    val w = 16; val divisor = 64
    corpus.flatMap { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val n = b.length
      val cuts = 0 +: (w until n)
        .filter(i => hex60(b.slice(i - w, i)) % divisor == 0) :+ n
      cuts.sliding(2).zipWithIndex.map {
        case (Seq(a, c), j0) =>
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(b.slice(a, c)).map("%02x".format(_)).mkString
          (id, j0 + 1, c - a, h)
      }
    }.toSet
  }

  test("NUL (0x00) bytes are rejected at index build, not silently " +
       "mis-ranked") {
    // the pack seed's past-end sentinel IS byte 0, so a NUL-bearing
    // suffix would tie with its NUL-free prefix and freeze as "equal" at
    // the fixed point — the build now enforces the documented no-NUL
    // contract loudly (ADVICE r10; PackBytes8 Scaladoc)
    val corpus = Seq((0L, "clean ascii doc"), (1L, "has a \u0000 nul byte"))
    val ex = intercept[Exception] {
      TextStats.suffixRanksGlobal(corpus.toDF("doc_id", "text"))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("NUL")),
      s"expected the NUL ingestion guard to fire, got: ${ex.getMessage}")
  }

  test("NUL bytes are rejected by the PER-DOC suffixRanks path too " +
       "(ADVICE r11: it shares the pack8 sentinel but lacked the guard)") {
    val corpus = Seq((0L, "clean ascii doc"), (1L, "has a \u0000 nul byte"))
    val ex = intercept[Exception] {
      TextStats.suffixRanks(corpus.toDF("doc_id", "text")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("NUL")),
      s"expected the shared ingestion guard to fire, got: ${ex.getMessage}")
  }

  for (seed <- Seq(11L, 42L, 2026L)) {
    test(s"seed $seed: global byte suffix ranks on a random multilingual " +
         "corpus match the naive byte-array sort") {
      val corpus = genCorpus(seed)
      val frame = corpus.toDF("doc_id", "text")
      val got = TextStats.suffixRanksGlobal(frame)
        .select($"doc_id", $"sa_pos", $"r")
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got === naiveRanks(corpus),
        s"distributed ranks drifted from the naive sort (seed $seed)")
    }

    test(s"seed $seed: longest duplicated byte string on a random " +
         "multilingual corpus matches the exhaustive scan") {
      val corpus = genCorpus(seed)
      val frame = corpus.toDF("doc_id", "text")
      val got = Dedup.longestDupUnicodeFrom(frame)
        .select($"lmax", $"g", $"n_occ", $"n_docs")
        .as[(Long, String, Long, Long)].collect().toSeq
        .sortBy(_._2)
      assert(got === naiveLongestDup(corpus),
        s"longest-dup drifted from the exhaustive reference (seed $seed)")
    }

    test(s"seed $seed: winnow fingerprints on a random multilingual " +
         "corpus match the naive byte-gram reference") {
      val corpus = genCorpus(seed)
      val got = TextStats.winnowFrom(corpus.toDF("doc_id", "text"))
        .select($"doc_id", $"n_fps", $"fp_head")
        .as[(Long, Long, String)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === naiveWinnow(corpus),
        s"winnow drifted from the byte-gram reference (seed $seed)")
    }

    test(s"seed $seed: CDC chunks on a random multilingual corpus match " +
         "the naive byte-boundary reference and tile the byte stream") {
      val corpus = genCorpus(seed)
      val batch = Dedup.cdcChunkRowsBatch(corpus.toDF("doc_id", "text"))
      val got = batch.select($"doc_id", $"j", $"nb", $"h")
        .as[(Long, Int, Int, String)].collect().toSet
      assert(got === naiveCdc(corpus),
        s"CDC chunker drifted from the byte-boundary reference (seed $seed)")
      val widths = batch.groupBy($"doc_id").agg(sum($"nb").as("s"))
        .as[(Long, Long)].collect().toMap
      corpus.filter(_._2.nonEmpty).foreach { case (id, text) =>
        assert(widths(id) === text.getBytes("UTF-8").length.toLong,
          s"doc $id: chunks do not tile the byte stream (seed $seed)")
      }
    }
  }
}
