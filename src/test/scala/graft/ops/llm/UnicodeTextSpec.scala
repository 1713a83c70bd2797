package graft.ops.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-10 byte-semantics laws on the planted NON-ASCII corpus
  * ([[UnicodeGates]].docs): the operators whose DuckDB oracle cannot
  * spell byte-slice hashing (no BLOB md5 in DuckDB 1.0) are pinned here
  * against INDEPENDENT driver-side references instead — a JDK
  * MessageDigest replica of the gram/boundary rules and a plain
  * byte-array sort for the suffix ranks. Where the oracle CAN spell the
  * semantics (hex spelling), the `llm_*_unicode` gates cover it; these
  * laws close the rest (VERDICT r9 #1).
  */
class UnicodeTextSpec extends SparkSpec {

  import spark.implicits._

  private val corpus = UnicodeGates.docs
  private def frame = UnicodeGates.frame(spark)

  // independent replica of the 60-bit md5 prefix (Md5Hex60.fold spelled
  // via BigInt, not bit-shifts)
  private def hex60(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    BigInt(1, d.take(8)).toLong >>> 4
  }

  test("winnow fingerprints on the multilingual corpus match a naive " +
       "byte-gram reference (k=8 bytes, w=4 grams)") {
    val k = 8; val w = 4
    val expected = corpus.flatMap { case (id, text) =>
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
    val got = TextStats.winnowFrom(frame)
      .select($"doc_id", $"n_fps", $"fp_head")
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === expected,
      "distributed winnow drifted from the byte-gram reference")
  }

  test("CDC chunking on the multilingual corpus matches a naive " +
       "byte-boundary reference (16-byte window, divisor 64), and the " +
       "streaming/batch twins stay row-identical") {
    val w = 16; val divisor = 64
    val expected = corpus.flatMap { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val n = b.length
      val cuts = 0 +: (w until n)
        .filter(i => hex60(b.slice(i - w, i)) % divisor == 0) :+ n
      // the contract emits exactly one (empty) chunk for an empty doc:
      // cuts2 = [0, 0] → one zero-width slice (both engine spellings do)
      cuts.sliding(2).zipWithIndex.map {
        case (Seq(a, c), j0) =>
          val slice = b.slice(a, c)
          val h = java.security.MessageDigest.getInstance("MD5").digest(slice)
            .map("%02x".format(_)).mkString
          (id, j0 + 1, c - a, h)
      }
    }.toSet
    val batch = Dedup.cdcChunkRowsBatch(frame)
    val got = batch.select($"doc_id", $"j", $"nb", $"h")
      .as[(Long, Int, Int, String)].collect().toSet
    assert(got === expected,
      "batch CDC chunker drifted from the byte-boundary reference")
    // twins: identical rows including the decoded display chunk
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(Dedup.cdcChunkRows(frame)) === canon(batch),
      "streaming/batch chunker twins drifted on non-ASCII text")
    // byte-exact coverage: per-doc chunk widths sum to the byte length
    val widths = batch.groupBy($"doc_id").agg(sum($"nb").as("s"))
      .as[(Long, Long)].collect().toMap
    corpus.filter(_._2.nonEmpty).foreach { case (id, text) =>
      assert(widths(id) === text.getBytes("UTF-8").length.toLong,
        s"doc $id: chunks do not tile the byte stream")
    }
  }

  test("global suffix ranks on the multilingual corpus match a naive " +
       "driver-side byte-suffix sort (incl. mid-character and " +
       "astral-plane suffix starts)") {
    val suffixes = corpus.flatMap { case (id, text) =>
      val b = text.getBytes("UTF-8")
      b.indices.map(i => (id, i.toLong, b.drop(i)))
    }
    val ord = new Ordering[Array[Byte]] {
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
    val sorted = suffixes.sortBy(_._3)(ord)
    // dense ranks with byte-equal suffixes tied
    val expected = scala.collection.mutable.Map[(Long, Long), Long]()
    var rank = 0L
    var prev: Array[Byte] = null
    sorted.foreach { case (id, i, suf) =>
      if (prev == null || ord.compare(prev, suf) != 0) rank += 1
      prev = suf
      expected((id, i)) = rank
    }
    val got = TextStats.suffixRanksGlobal(frame)
      .select($"doc_id", $"sa_pos", $"r")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === expected.toMap,
      "distributed byte suffix ranks drifted from the naive sort")
  }

  test("the planted 63-byte CJK dup is the corpus-wide longest " +
       "duplicated byte string, found across all three planted docs " +
       "(one ending exactly at the dup's last byte)") {
    val out = Dedup.longestDupUnicodeFrom(frame).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 3L * UnicodeGates.PlantedDup.length,
      "lmax must be the planted phrase's byte width")
    val bytes = r.getString(1).grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    assert(new String(bytes, "UTF-8") === UnicodeGates.PlantedDup)
    assert(r.getLong(2) === 3L && r.getLong(3) === 3L)
  }
}
