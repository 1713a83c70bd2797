package graft.ops.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted NON-ASCII corpus + the gates that prove the byte-level text
  * machinery on it (VERDICT r9 #1: every text gate was green only on
  * ASCII fixtures, where char and byte semantics coincide — this pack
  * makes the distinction observable and verified).
  *
  * The corpus is defined ONCE here in Scala and interpolated verbatim
  * into the DuckDB oracle as a VALUES list, so both engines see
  * byte-identical UTF-8 text (no file round-trip, no fixture drift). It
  * plants: a 63-byte CJK phrase duplicated across three documents (one
  * of which ENDS at the phrase's last byte — the window-tail gotcha),
  * combining marks in both NFC and NFD spellings, astral-plane emoji
  * (4-byte UTF-8), RTL Hebrew/Arabic, Greek/Cyrillic 2-byte scripts, a
  * single-character document shorter than the suffix seed width, an
  * empty document, and a mixed-script line.
  *
  * Oracle spelling for BYTE semantics: DuckDB 1.0 has no BLOB
  * substring/md5, but `hex(encode(text))` gives 2 hex chars per byte,
  * and uppercase-hex string order IS byte order ('0'-'9' < 'A'-'F' in
  * ASCII) — so byte slicing is `substr(hx, 2i+1, 2L)` and
  * byte-lexicographic suffix comparison is plain VARCHAR comparison of
  * hex suffixes. Hex-prefix LCPs floor-divide by 2 back to byte LCPs
  * (two different bytes sharing a high nibble share 1 hex char — the
  * floor drops it, exactly).
  */
object UnicodeGates extends graft.ops.QueryPack {

  /** The planted duplicated phrase: 21 CJK ideographs × 3 bytes. Its
    * occurrences are bounded by bytes that differ on every side (':'
    * 0x3A / '—'-tail 0x94 / '→'-tail 0x92 before; ' ' 0x20 / '，'-head
    * 0xEF / end-of-doc after), so the corpus-wide longest duplicated
    * BYTE string is exactly this phrase.
    */
  val PlantedDup = "训练数据质量决定模型最终效果与泛化能力上限"

  val docs: Seq[(Long, String)] = Seq(
    0L -> s"预处理阶段:$PlantedDup 之后再迭代清洗流程。",
    1L -> s"评估备注—$PlantedDup，另见附录的消融实验。",
    2L -> "Zürich café vs café — naïve résumé, d'entraînement qualité",
    3L -> "🦀🚀🌍 multimodal data pipeline 🧪 emoji stress 🦀🚀🌍 tail",
    4L -> "שלום עולם — בדיקת טקסט מימין לשמאל مرحبا بالعالم اختبار النص",
    5L -> "Ελληνικά και Русский текст: δοκιμή δύο byte κωδικοποίησης",
    6L -> s"摘要→$PlantedDup",
    7L -> "汉",
    8L -> "",
    9L -> "mixed ASCII + 中文 + عربي + 🦀 in one line"
  )

  /** The corpus as a DataFrame — ignores the fixture dir by design (the
    * planted text IS the fixture; gates take (spark, dir) per the driver
    * contract).
    */
  def frame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
  }

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The corpus as a DuckDB CTE body: `docs(doc_id, text)`. */
  private def docsCte: String =
    docs.map { case (id, t) => s"(${id}::BIGINT, ${sqlLit(t)})" }
      .mkString("docs(doc_id, text) AS (VALUES ", ", ", ")")

  /** Shared oracle prelude: per-doc hex spelling + byte length. */
  private def hexCte: String =
    s"""WITH $docsCte,
       |h AS (SELECT doc_id, hex(encode(text)) AS hx,
       |        octet_length(encode(text))::BIGINT AS n FROM docs),
       |s AS (SELECT doc_id, i, substr(hx, (2 * i + 1)::INT) AS suf
       |      FROM h, unnest(range(0, n)) AS t(i))""".stripMargin

  /** One shared, memoized index over the planted corpus (VERDICT r10
    * #4: each gate previously paid its own full un-memoized distributed
    * build over the same 10 docs — ~half the pack's bench cost was
    * duplicated scheduling). Fingerprint = md5 of the docs themselves,
    * so any corpus edit changes the cache key; the un-memoized
    * from-frame twins stay in place for laws/fuzz/probes.
    */
  private def index(spark: SparkSession): SuffixIndex.Index = {
    val fp = {
      val md = java.security.MessageDigest.getInstance("MD5")
      docs.foreach { case (id, t) =>
        md.update((id.toString + "\u0000" + t).getBytes("UTF-8"))
      }
      "unicode-gates:" + md.digest().map("%02x".format(_)).mkString
    }
    SuffixIndex.forFrame(frame(spark), fp)
  }

  /** Corpus-global BYTE-level suffix array over the planted corpus —
    * the gate that makes [[SuffixIndex]]'s round-10 byte semantics
    * observable: ranks must equal the naive byte-lexicographic sort of
    * every byte suffix, including suffixes starting mid-character and
    * inside astral-plane emoji.
    */
  def suffixUnicode(spark: SparkSession, dir: String): DataFrame =
    TextStats.suffixRanksGlobalFromIndex(index(spark))

  /** Longest duplicated BYTE string on the planted corpus, hex-spelled
    * output (a maximal duplicated byte run may end mid-character — hex
    * is lossless where a decode would substitute). Exercises the full
    * shared-index bracket/binary-search machinery on multilingual text.
    */
  def longestDupUnicode(spark: SparkSession, dir: String): DataFrame =
    Dedup.longestDupUnicodeFromIndex(index(spark), frame(spark))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_suffix_unicode" -> (suffixUnicode _),
    "llm_longest_dup_unicode" -> (longestDupUnicode _)
  )

  def oracle: Map[String, String] = Map(
    // naive sort of HEX byte suffixes == byte-lexicographic suffix sort;
    // dense_rank because identical cross-doc suffixes tie (the planted
    // CJK dup ties for 63 consecutive byte levels)
    "llm_suffix_unicode" ->
      s"""$hexCte
         |SELECT doc_id,
         |  dense_rank() OVER (ORDER BY suf) AS r,
         |  i AS sa_pos
         |FROM s ORDER BY r, doc_id, sa_pos""".stripMargin,
    // classical adjacent-LCP over the naive suffix sort, in hex space:
    // hex-char LCP floor-div 2 = byte LCP; winning slices are 2·lmax hex
    // chars, lower-cased to match the engine's lower(hex(...)) spelling
    "llm_longest_dup_unicode" ->
      s"""$hexCte,
         |o AS (SELECT suf, lag(suf) OVER (ORDER BY suf) AS prev FROM s),
         |l AS (
         |  SELECT CASE WHEN prev IS NULL THEN 0 ELSE coalesce(
         |    nullif(list_position(list_transform(
         |      range(1, least(len(suf), len(prev)) + 1),
         |      k -> substr(suf, k, 1) = substr(prev, k, 1)), false), 0) - 1,
         |    least(len(suf), len(prev))) END // 2 AS lcp
         |  FROM o),
         |m AS (SELECT max(lcp)::BIGINT AS lmax FROM l),
         |g AS (
         |  SELECT doc_id, lower(substr(hx, (2 * i + 1)::INT,
         |                              (2 * (SELECT lmax FROM m))::INT)) AS g
         |  FROM h, unnest(range(0, n)) AS t(i)
         |  WHERE n - i >= (SELECT lmax FROM m))
         |SELECT (SELECT lmax FROM m) AS lmax, g,
         |  COUNT(*)::BIGINT AS n_occ,
         |  COUNT(DISTINCT doc_id)::BIGINT AS n_docs
         |FROM g
         |WHERE (SELECT lmax FROM m) > 0
         |GROUP BY g HAVING COUNT(*) >= 2 ORDER BY g""".stripMargin
    // the lmax > 0 guard (ADVICE r10): with no duplicated byte anywhere
    // the engine returns an EMPTY frame, while the unguarded oracle
    // grouped zero-length grams into one row — only the planted 63-byte
    // dup kept them aligned; the guard makes both sides empty on a
    // dup-free corpus so editing the corpus can't trip the gate.
  )
}
