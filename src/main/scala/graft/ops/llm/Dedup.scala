package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.QueryPack

/** Deduplication operators for LLM training-data pipelines (SURVEY.md §2
  * C36/C37 + the round-2 mandate): exact content-hash dedup, MinHash+LSH
  * near-dup, SimHash near-dup, exact n-gram Jaccard similarity join, and
  * embedding-cosine near-dup — all over the `documents`/`embeddings`
  * fixtures (FIXTURES.md §2).
  *
  * The reference has no dedup code (its only transform is an uppercase
  * processor, /root/reference/pyspark_stream/processors/custom_processors.py:49);
  * these are the BASELINE.json extension surface, designed Spark-first.
  *
  * Scale notes (100 TB posture):
  *  - Exact dedup is one hash aggregate on the content hash — map-side
  *    partials, one shuffle, no sort.
  *  - MinHash/LSH shuffles on (band, bucket) — candidate pairs are only
  *    ever generated for documents sharing an LSH bucket, NEVER all-pairs.
  *    The exact-Jaccard verify touches candidate pairs only.
  *  - The n-gram similarity join is an inverted-index join (shuffle on the
  *    shingle), which is linear in the number of co-occurring shingle
  *    pairs — the standard sparse exact path when overlap is rare.
  *  - SimHash banding is exact by pigeonhole: hamming distance ≤ 3 over a
  *    32-bit signature forces at least one of 4 disjoint 8-bit blocks to
  *    match, so the block-equality candidate join has 100% recall (unlike
  *    probabilistic MinHash banding).
  *  - The embedding near-dup is an IVF coarse-quantizer cell shuffle
  *    (deterministic md5-derived centroids, cell-pair replication so the
  *    exact result is preserved) with the tight verify loop running per
  *    cell-pair group — executor memory bounded by cell size, nothing
  *    materialized on the driver (see [[dedupEmbedding]]).
  *
  * Cross-engine determinism: outputs avoid engine-specific hashes. Where a
  * hash IS the output (exact dedup, SimHash), md5 hex — bit-identical in
  * Spark and DuckDB — is used; Jaccard thresholds are integer arithmetic
  * (5·inter ≥ 3·uni ⟺ J ≥ 0.6) so no float rounding can diverge; cosine
  * values are computed as an identical left-to-right double fold in both
  * engines (see [[Similarity]]).
  */
object Dedup extends QueryPack {

  /** The word n-gram shingle expression over a token array `ws` — ONE
    * definition shared by every shingle consumer (MinHash, SimHash,
    * Jaccard, fingerprint) and mirrored by [[shingleCte]] for the
    * oracles, so tokenization can never silently diverge between
    * queries. The 31-word fixture vocabulary makes unigrams useless
    * (every pair of documents shares most words); 3-grams give ~30k
    * possible shingles, 4-grams ~1M.
    */
  private def shingleExpr(n: Int): String = {
    val parts = (0 until n).map(k => if (k == 0) "ws[i]" else s"ws[i+$k]")
    s"transform(sequence(0, size(ws) - $n), i -> concat_ws(' ', ${parts.mkString(", ")}))"
  }

  /** Word n-gram shingles per document; `distinct=false` skips the
    * dedup shuffle for consumers whose aggregates dedup inherently
    * (min, collect_set).
    */
  private[llm] def shingles(spark: SparkSession, dir: String, n: Int,
                            distinct: Boolean): DataFrame =
    shinglesFrom(Tables.documents(spark, dir), n, distinct)

  /** [[shingles]] over any (doc_id, text) corpus — the streaming-twin
    * entry ([[graft.streaming.DecontamStream]] shingles each arriving
    * micro-batch with the SAME expression the batch gates use).
    */
  private[graft] def shinglesFrom(docs: DataFrame, n: Int,
                                  distinct: Boolean): DataFrame = {
    import docs.sparkSession.implicits._
    val raw = docs
      .select($"doc_id", split($"text", " ").as("ws"))
      .filter(size($"ws") >= n)
      .select($"doc_id", explode(expr(shingleExpr(n))).as("s"))
    if (distinct) raw.distinct() else raw
  }

  private[llm] def shingles3(spark: SparkSession, dir: String): DataFrame =
    shingles(spark, dir, 3, distinct = true)

  /** DuckDB twin of [[shingles]]: `toks`/`sh` CTE text (always distinct —
    * SQL-side dedup cost is irrelevant to the oracle).
    */
  private[llm] def shingleCte(n: Int): String = {
    val parts = (1 to n).map(k => if (k == 1) "ws[i]" else s"ws[i+${k - 1}]")
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |sh AS (SELECT DISTINCT doc_id, ${parts.mkString(" || ' ' || ")} AS s
       |       FROM toks, unnest(range(1, len(ws) - ${n - 2})) AS t(i)
       |       WHERE len(ws) >= $n)""".stripMargin
  }

  /** C36 exact dedup: content-hash (md5) grouping with keep-lowest-id
    * canonicalization, over a corpus that unions the documents table with
    * a simulated re-crawl of its first 100 docs (new ids, same bytes) so
    * the dedup is exercised on real duplicates.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val recrawl = docs.filter($"doc_id" < 100)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text")
    docs.union(recrawl)
      .withColumn("content_hash", md5(encode($"text", "UTF-8")))
      .groupBy($"content_hash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select($"keep_id", $"n_copies", $"content_hash")
      .orderBy($"keep_id")
  }

  /** C36 INCREMENTAL dedup — the batch-over-index form every production
    * crawl pipeline actually runs: each new crawl batch is deduplicated
    * (a) within itself and (b) against the accumulated content-hash index
    * of everything already ingested, and only the survivors append to the
    * corpus. Simulated here from the fixture: the index is docs < 400;
    * the incoming batch is the genuinely-new docs ≥ 400, plus a re-crawl
    * of docs < 50 (same bytes, new ids — dropped against the index), plus
    * a second copy of docs 400–419 (in-batch duplicates — collapsed with
    * keep-lowest-id before the index is ever consulted). All three paths
    * leave evidence in the output: 100 survivors, 20 of them with
    * n_in_batch = 2, and the 50 re-crawls absent.
    *
    * Scale shape: in-batch dedup is one hash aggregate on the (small)
    * batch; the index probe is an anti join where the INDEX is the huge
    * side at 100 TB — the SHUFFLE_HASH hint pins the plan away from ever
    * broadcasting it (the batch-sized build side is what you want; a
    * bloom filter of the batch's hashes pushed to the index scan is the
    * further refinement, and the runtime-filter rule the repo pins
    * separately does exactly that). Nothing here re-reads the corpus.
    */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val index = docs.filter($"doc_id" < 400)
      .select(md5(encode($"text", "UTF-8")).as("content_hash")).distinct()
    val batch = docs.filter($"doc_id" >= 400)
      .unionAll(docs.filter($"doc_id" < 50)
        .select(($"doc_id" + 2000000L).as("doc_id"), $"text"))
      .unionAll(docs.filter($"doc_id" >= 400 && $"doc_id" < 420)
        .select(($"doc_id" + 3000000L).as("doc_id"), $"text"))
      .withColumn("content_hash", md5(encode($"text", "UTF-8")))
    batch.groupBy($"content_hash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_in_batch"))
      .join(index.hint("SHUFFLE_HASH"), Seq("content_hash"), "left_anti")
      .select($"keep_id", $"n_in_batch", $"content_hash")
      .orderBy($"keep_id")
  }

  /** The bloom-prescreened form of [[dedupIncremental]] — the shuffle
    * economics that matter at 100 TB: in steady state almost every
    * new-batch document is genuinely new, so the anti-join's index-side
    * shuffle is mostly wasted work. A Bloom filter over the index
    * (`DataFrameStatFunctions.bloomFilter`, ONE distributed aggregate;
    * the sketch — not the index — ships with the closure) splits the
    * batch map-side:
    * definitely-new rows (bloom says absent — NO false negatives) skip
    * the join entirely and only the "maybe" sliver anti-joins the exact
    * index. The result is therefore IDENTICAL to the plain anti-join —
    * the oracle IS the plain anti-join, so the gate proves the rewrite
    * changes cost, never answers. False-positive rate only moves the
    * maybe-sliver size, i.e. performance, not correctness. Same sketch
    * economics as the CMS heavy-hitters gate: only the bit array ever
    * reaches the driver.
    */
  def dedupBloomIncremental(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val index = docs.filter($"doc_id" < 400)
      .select(md5(encode($"text", "UTF-8")).as("content_hash")).distinct()
    val batch = docs.filter($"doc_id" >= 400)
      .unionAll(docs.filter($"doc_id" < 50)
        .select(($"doc_id" + 2000000L).as("doc_id"), $"text"))
      .unionAll(docs.filter($"doc_id" >= 400 && $"doc_id" < 420)
        .select(($"doc_id" + 3000000L).as("doc_id"), $"text"))
      .withColumn("content_hash", md5(encode($"text", "UTF-8")))
    // public distributed sketch API (one aggregate over the index),
    // sized from the actual index cardinality (an under-sized filter
    // saturates toward fpp≈1 and the prescreen degrades to the plain
    // anti-join PLUS a wasted index aggregate — correctness unaffected,
    // economics gone). A deployment that tracks its index size sets
    // `spark.graft.dedup.bloomExpectedItems` to skip the count pass.
    // The membership probe is the native codegen'd
    // `graft_bloom_might_contain` expression (functions/BloomMightContain
    // .scala) over the filter's serialized bytes — no ScalaUDF, no
    // closure serialization — and runs on the already-aggregated batch
    // keys (batch-sized, never corpus-sized).
    graft.functions.GraftFunctions.register(spark)
    val expectedItems = spark.conf
      .getOption("spark.graft.dedup.bloomExpectedItems").map(_.toLong)
      .getOrElse(math.max(index.count(), 1L))
    val bf = index.stat.bloomFilter("content_hash", expectedItems, 0.03)
    val bfBytes = {
      val baos = new java.io.ByteArrayOutputStream()
      bf.writeTo(baos)
      baos.toByteArray
    }
    val split = batch.groupBy($"content_hash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_in_batch"))
      .withColumn("maybe",
        call_function("graft_bloom_might_contain", lit(bfBytes), $"content_hash"))
    val definite = split.where(!$"maybe").drop("maybe")
    val verified = split.where($"maybe").drop("maybe")
      .join(index.hint("SHUFFLE_HASH"), Seq("content_hash"), "left_anti")
    definite.unionByName(verified)
      .select($"keep_id", $"n_in_batch", $"content_hash")
      .orderBy($"keep_id")
  }

  /** Exact LONGEST duplicated substring in the corpus — the
    * unbounded-length memorization diagnostic ([[substringSpansFrom]]'s
    * fixed 50-gram machinery finds "positions lying in SOME ≥50-char
    * duplicate"; a merged span over-approximates contiguous repeats
    * because adjacent grams may duplicate against different partners —
    * this operator answers "what is the single longest verbatim string
    * that occurs twice anywhere", exactly).
    *
    * Method (round 9 — derived from the SHARED [[SuffixIndex]] instead
    * of the retired standalone rolling-hash prober, collapsing the
    * bench's two heaviest pipelines into one build):
    *   - a rank frame at compare length c certifies EXACT c-byte
    *     equality at any position with ≥ c remaining bytes, so "some
    *     L-gram occurs twice" ⟺ "some tuple of ranks at offsets
    *     {0, c, 2c, …, L−c} (consecutive gaps ≤ c) occurs twice among
    *     valid starts" — the classical O(1) substring-equality check
    *     from doubling ranks, with no hash-collision case at all;
    *   - BRACKET: walking rounds finest-first, the largest compare
    *     length c with a "full tie" (two positions of ≥ c remaining
    *     chars sharing a rank) gives L* ≥ c, and the smallest round
    *     without one gives L* < c' — so the binary search runs inside
    *     one round's granularity, on documents PRUNED to those holding
    *     a full tie at the bracket level (any longer dup's docs must);
    *   - probe(L): per-doc `lead` window for the offset ranks (fixed
    *     multiples of c precomputed once and pinned; only the L−c
    *     offset varies per probe) + one hash aggregate, "any tuple
    *     count ≥ 2";
    *   - below-seed fallback (L* under the seed's certified prefix,
    *     14 bytes): binary search with direct byte-slice group-bys;
    *   - at L*: the tuple groups ≥ 2 ARE the duplicated L*-grams
    *     (exact, not candidates); join back to texts for the substring
    *     spelling and per-group occurrence/document counts.
    *
    * The oracle finds the same maximum by the INDEPENDENT classical
    * method — max LCP over adjacent suffixes of the naive full suffix
    * sort (DuckDB materializes and sorts actual suffix strings); the
    * engine never materializes a suffix and never globally sorts, so
    * the hash match proves the algorithm, not a shared spelling.
    */
  def longestDupSubstring(spark: SparkSession, dir: String): DataFrame =
    longestDupFromIndex(SuffixIndex.forDir(spark, dir),
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  private[llm] def longestDupSubstringFrom(docs: DataFrame): DataFrame =
    longestDupFromIndex(SuffixIndex.build(docs),
      docs.select(col("doc_id"), col("text")))

  /** [[longestDupSubstringFrom]] with hex-spelled `g` — the
    * [[UnicodeGates]] entry: on multilingual text the maximal duplicated
    * BYTE string may end mid-character, which hex represents losslessly.
    */
  private[llm] def longestDupUnicodeFrom(docs: DataFrame): DataFrame =
    longestDupFromIndex(SuffixIndex.build(docs),
      docs.select(col("doc_id"), col("text")), hexOut = true)

  /** Hex-output longest-dup over a caller-held (possibly memoized) index
    * — the [[UnicodeGates]] entry sharing one [[SuffixIndex.forFrame]]
    * build with the suffix-array gate (VERDICT r10 #4).
    */
  private[llm] def longestDupUnicodeFromIndex(ix: SuffixIndex.Index,
                                              docs: DataFrame): DataFrame =
    longestDupFromIndex(ix, docs.select(col("doc_id"), col("text")),
      hexOut = true)

  private def ceilDiv(a: Int, b: Int): Int = (a + b - 1) / b

  private def longestDupFromIndex(ix: SuffixIndex.Index,
                                  docs: DataFrame,
                                  hexOut: Boolean = false): DataFrame = {
    import docs.sparkSession.implicits._
    // BYTE semantics throughout (the index is byte-indexed since round
    // 10): lmax counts bytes, slices are byte slices of the UTF-8
    // encoding. `g` formats the winning byte string as UTF-8 text for
    // the ASCII-fixture gate (identical to the old char spelling there)
    // or as hex for the unicode gate — a maximal duplicated BYTE string
    // may end mid-character (CJK siblings share lead bytes), which hex
    // represents losslessly while a decode would replace.
    val base = docs.select($"doc_id", $"text")
      .where(octet_length($"text") > 0)
    // cast(binary → string) reinterprets the bytes as a UTF8String
    // WITHOUT validation — total (Spark 4's `decode` throws
    // MALFORMED_CHARACTER_CODING on a mid-character slice) and
    // byte-lossless, == the char spelling on ASCII
    def fmtG(bytes: Column): Column =
      if (hexOut) lower(hex(bytes)) else bytes.cast("string")

    val emptyOut = base.sparkSession.emptyDataFrame
      .select(lit(0L).as("lmax"), lit("").as("g"),
        lit(0L).as("n_occ"), lit(0L).as("n_docs"))
      .where(lit(false))

    // stage telemetry for tuning runs (same contract as SuffixIndex)
    val dbg = java.lang.Boolean.getBoolean("graft.suffix.debug") ||
      sys.env.get("SPARK_GRAFT_SUFFIX_DEBUG").contains("1")
    var tDbg = System.nanoTime()
    def lap(tag: String): Unit = if (dbg) {
      println(f"[longest-dup] $tag: ${(System.nanoTime() - tDbg) / 1e9}%.1fs")
      tDbg = System.nanoTime()
    }

    // ---- bracket: finest round with a FULL tie (both positions have
    // ≥ compareLen remaining chars ⇒ true LCP ≥ compareLen; padded
    // short-suffix ties certify only their own length and don't count)
    var loRound: SuffixIndex.Round = null
    var lo = 0
    var hiBound = ix.maxLen
    // materialized on the bracket's HIT round: the docs holding a
    // full-tied rank group at that level — the probe phase's prune set.
    // Fused into the bracket walk (r11): the walk already aggregates the
    // tied residue per round, so producing the doc ids on the hit costs
    // one tiny pin instead of a second corpus-wide residue scan later
    var tiedDocs: DataFrame = null
    val it = ix.rounds.reverseIterator
    while (loRound == null && it.hasNext) {
      val rd = it.next()
      if (rd.compareLen <= ix.maxLen) {
        // !fin prefilter (r11): fin marks globally-singleton ranks, so a
        // tied group's members are all !fin — the aggregation's shuffle
        // then moves only the tied residue, not the corpus (validity can
        // only SHRINK a group, never lift a singleton to ≥ 2)
        val td = rd.ranks.where(!$"fin")
          .join(broadcast(ix.lens), Seq("doc_id"))
          .where($"len" - $"i" >= rd.compareLen)
          .withColumn("n", count(lit(1)).over(Window.partitionBy($"r")))
          .where($"n" >= 2).select($"doc_id").distinct()
          .transform(graft.state.Materialize.pin)
        val anyTie = !td.isEmpty
        if (anyTie) { loRound = rd; lo = rd.compareLen; tiedDocs = td }
        else hiBound = rd.compareLen - 1
        lap(s"bracket anyTie c=${rd.compareLen} -> $anyTie")
      }
    }

    val seedLen = ix.rounds.head.compareLen
    if (loRound == null) {
      // L* below the seed's certified prefix: direct byte-slice probes
      // (tiny grams, corpus-wide)
      val withLen = base.withColumn("len", octet_length($"text"))
        .withColumn("tb", encode($"text", "UTF-8"))
      def grams(l: Int): DataFrame = withLen.where($"len" >= l)
        .select($"doc_id", $"tb", explode(expr(s"sequence(0, len - $l)")).as("i"))
        .select($"doc_id", expr(s"substring(tb, cast(i + 1 as int), $l)").as("gb"))
      def hasDup(l: Int): Boolean =
        grams(l).groupBy($"gb").agg(count(lit(1)).as("n"))
          .where($"n" >= 2).limit(1).count() > 0
      var l0 = 0
      var h0 = math.min(hiBound, seedLen - 1)
      while (l0 < h0) {
        val mid = (l0 + h0 + 1) / 2
        if (hasDup(mid)) l0 = mid else h0 = mid - 1
      }
      if (l0 == 0) emptyOut
      else grams(l0).groupBy($"gb")
        .agg(count(lit(1)).as("n_occ"), countDistinct($"doc_id").as("n_docs"))
        .where($"n_occ" >= 2)
        .select(lit(l0.toLong).as("lmax"), fmtG($"gb").as("g"), $"n_occ", $"n_docs")
        .orderBy($"g")
    } else {
      val c = lo
      val hi = math.min(hiBound, ix.maxLen)
      // the bracket round frame is consumed twice (tiedDocs, pf0) — both
      // scans read the build's already-materialized pins through a lazy
      // union, so a further corpus-wide pin here bought nothing once the
      // probes moved onto the pruned pf frame (r11 measurement; the r10
      // pin predated the pf prune)
      val loRanks = loRound.ranks
      val byPos = Window.partitionBy($"doc_id").orderBy($"i")
      // precompute the offset ranks at fixed multiples of c once; the
      // probes' only per-L window is the single L−c offset
      val kPre = math.max(ceilDiv(hi, c) - 1, 0)
      if (dbg) { val n = tiedDocs.count(); lap(s"tiedDocs n=$n (dbg-only job)") }
      // broadcast the id set: without the hint the semi-join plans as a
      // sort-merge and shuffles the corpus-sized rank frame (measured
      // ~1.5s of the pf pin at sf0.1 for a 303-doc id set). The frame is
      // ids-only (16 B/doc) and strictly smaller than the pf frame the
      // join produces — if the tied-doc set were ever too big to
      // broadcast, pf itself (every POSITION of those docs) would be the
      // blocker first, not this hint
      val pf0 = loRanks.drop("fin")
        .join(broadcast(tiedDocs), Seq("doc_id"), "left_semi")
        .join(broadcast(ix.lens), Seq("doc_id"))
        // per-POSITION prune flag: a start of any dup of length ≥ c must
        // share its first c chars with another valid start, i.e. sit in
        // a rank group with ≥ 2 members of ≥ c remaining chars. Probes
        // filter on it, shrinking every group-by to candidate starts
        // only (the lead windows still see every position — the flag
        // restricts group-by INPUT rows, not the window frames)
        .withColumn("ntc", sum(when($"len" - $"i" >= c, 1).otherwise(0))
          .over(Window.partitionBy($"r")))
      // the tied-doc prune usually leaves a SMALL candidate frame (only
      // documents holding a ≥c-byte dup survive), and the probe batches
      // each run a 3-stage job over it — at 32 shuffle partitions the
      // fixed per-stage cost dominates. Right-size the probe frame's
      // parallelism BEFORE it is built (r18, VERDICT r17 #1): pf has
      // exactly one row per byte position of the tied docs, so
      // |pf| = Σ len over tiedDocs — one tiny aggregate over the pinned
      // lens frame (16 B/doc) replaces the former pin → count() →
      // repartition → SECOND pin of the candidate frame (the r17 stage
      // profile charged ~1.4s to that double materialization).
      val pfRows = ix.lens.join(broadcast(tiedDocs), Seq("doc_id"))
        .agg(sum($"len".cast("long"))).head().getLong(0)
      // ~4k rows per partition (r18; was 16k with the r17 7-cut sparse
      // batches): the join-gather probes below explode the CANDIDATE
      // rows into (length, offset) lookups, so per-partition probe
      // volume — not raw row count — is what a task carries. A
      // single-partition frame serializes the batch entirely while
      // over-splitting re-introduces per-task overhead.
      val shufP = docs.sparkSession.conf
        .get("spark.sql.shuffle.partitions").toInt
      val parts = math.max(1L, math.min(pfRows / 4096L + 1,
        shufP.toLong)).toInt
      // repartition feeds the offset-rank window directly:
      // hashpartitioning(doc_id, parts) satisfies the window's required
      // clustering at ANY partition count, so no second exchange —
      // one window pass, one pin
      val pf = (1 to kPre).foldLeft(
          pf0.repartition(parts, $"doc_id")) { (df, k) =>
        df.withColumn(s"rk$k", lead($"r", k * c).over(byPos))
      }.transform(graft.state.Materialize.pin)
      lap(s"pf build (c=$c, kPre=$kPre, rows=$pfRows, parts=$parts)")

      // ranks at offsets {0, c, …, (m−2)c, L−c}: consecutive gaps ≤ c,
      // union covers [0, L) ⇒ tuple equality ⟺ L-gram equality (every
      // offset position keeps ≥ c chars when i + L ≤ len, so no padded
      // rank is ever compared)
      def keyed(l: Int): DataFrame = {
        val m = ceilDiv(l, c)
        val offs = ((1 to (m - 2)).map(_ * c) :+ (l - c))
          .filter(_ > 0).distinct.sorted
        val varOffs = offs.filter(off => off % c != 0 || off / c > kPre)
        // variable-offset leads MUST be computed BEFORE the validity
        // filter: filtering first makes the window skip the trimmed
        // tail rows, so a dup ending near a document's end would read a
        // wrong/null offset rank and silently lose its collision
        val src = varOffs.foldLeft(pf) { (df, off) =>
          df.withColumn(s"rv$off", lead($"r", off).over(byPos))
        }
        val offCols = offs.zipWithIndex.map { case (off, j) =>
          val cc = if (varOffs.contains(off)) col(s"rv$off")
                   else col(s"rk${off / c}")
          cc.as(s"k$j")
        }
        src.where($"i" + l <= $"len" && $"ntc" >= 2)
          .select(($"doc_id" +: $"i" +: $"r" +: offCols): _*)
      }
      def keyCols(df: DataFrame): Seq[Column] =
        df.columns.filter(n => n == "r" || n.startsWith("k")).toSeq.map(col)
      // offsets a probe at length l compares (beyond the implicit 0)
      def offsFor(l: Int): Seq[Int] = {
        val m = ceilDiv(l, c)
        (((1 to (m - 2)).map(_ * c) :+ (l - c)).filter(_ > 0)).distinct.sorted
      }
      // ---- BATCHED multi-cut search via JOIN-GATHER (r18, VERDICT r17
      // #1; supersedes the r11 per-batch window form). The old form
      // computed one lead column per cut over EVERY pf row in a shared
      // window pass — measured ~65 ms/cut at sf0.1 (115k-row frame),
      // linear in cut count, even though only the CANDIDATE rows
      // (ntc ≥ 2 — positions that share their first c bytes with
      // another valid start) need offset ranks at all. The batch now
      // gathers exactly the (candidate, offset) rank lookups it needs:
      // each candidate row explodes into its valid probed lengths, each
      // length into its offset list, and ONE equi-join against the
      // pinned rank frame (pf re-projected as a (doc_id, pos) lookup
      // table) fetches the offset ranks; the key tuple is reassembled
      // as a sorted (off, rank) array and ONE aggregate on (length,
      // base rank, tuple) answers all K "does some L-gram occur twice"
      // questions at once. Every offset of a VALID probe (i + l ≤ len)
      // is in [1, len−c], so the inner join finds every lookup and the
      // reassembled tuples are complete by construction — no padding.
      // Per-batch work now scales with candidates × offsets, not
      // |pf| × cuts, and cost is near-flat in cut count (measured), so
      // the 2-batch dense cut schedule below is the right shape.
      def probeBatch(ls: Seq[Int]): Set[Int] = {
        // both join sides USER-partitioned by doc_id: hashpartitioning
        // on doc_id alone satisfies the (doc_id, pos) equi-join's
        // clustering AND the first group-by's (doc_id ∈ both key sets),
        // so the join and the tuple reassembly run partition-local at
        // `parts`-way parallelism — the planner's own ENSURE exchanges
        // here are below AQE's advisory size and get coalesced to ONE
        // task, serializing the whole gather (measured)
        val pfk = pf.select($"doc_id", $"i".as("pos"), $"r".as("ro"))
          .repartition(parts, $"doc_id")
        val cutStructs = ls.map(l => struct(lit(l).as("ll"),
          ($"i" + l <= $"len").as("ok")))
        val offArr = ls.tail.foldLeft(
            when($"ll" === ls.head, array(offsFor(ls.head).map(lit): _*))) {
          (acc, l) => acc.when($"ll" === l, array(offsFor(l).map(lit): _*))
        }
        pf.where($"ntc" >= 2)
          .select($"doc_id", $"i", $"r", $"len",
            explode(array(cutStructs: _*)).as("c"))
          .where($"c.ok")
          .select($"doc_id", $"i", $"r", $"c.ll".as("ll"))
          .select($"doc_id", $"i", $"r", $"ll", explode(offArr).as("off"))
          .select($"doc_id", $"i", $"r", $"ll", $"off",
            ($"i" + $"off").as("pos"))
          .repartition(parts, $"doc_id")
          .join(pfk.hint("SHUFFLE_HASH"), Seq("doc_id", "pos"))
          .groupBy($"ll", $"doc_id", $"i", $"r")
          .agg(sort_array(collect_list(struct($"off", $"ro"))).as("ks"))
          .groupBy($"ll", $"r", $"ks").agg(count(lit(1)).as("n"))
          .where($"n" >= 2)
          .select($"ll").distinct().as[Int].collect().toSet
      }
      var l0 = lo
      var h0 = hi
      while (l0 < h0) {
        val width = h0 - l0
        // Cut schedule (r18, VERDICT r17 #1 — measured, supersedes the
        // r11 evenly-spaced 7/15 schedule): a cut's probe volume FALLS
        // with length (only rows with i + l ≤ len survive the validity
        // filter), so evenly spaced cuts pay near-full volume on every
        // low cut while high cuts are almost free. Two regimes:
        //  - width ≤ 64: enumerate every integer in (l0, h0] — ONE
        //    batch finishes the search exactly (l0 == h0 after);
        //  - wider: an exponential-search ladder from the TOP
        //    (h0 − (2^j − 1) while that stays above l0): at most two
        //    cuts carry low-length volume, and an answer near the
        //    bracket top — the shape of planted/whole-document dups —
        //    brackets into the dense regime in one cheap batch, while
        //    an answer anywhere else still at least halves the width
        //    (all-bad ⇒ h0 drops past the deepest rung).
        val cuts: Seq[Int] =
          if (width <= 64) (1 to width).map(l0 + _)
          else Iterator.iterate(1L)(_ * 2).map(_ - 1)
            .takeWhile(_ < width).map(s => h0 - s.toInt).toSeq.sorted
        val dup = probeBatch(cuts)
        val good = cuts.filter(dup.contains)
        val firstBad = cuts.filterNot(dup.contains).headOption
        if (good.nonEmpty) l0 = good.max
        h0 = firstBad.map(_ - 1).getOrElse(h0)
        lap(s"probe batch ${cuts.size} cuts in [${cuts.head}, ${cuts.last}]" +
          s" -> [$l0, $h0]")
      }
      val lStar = l0
      val kd = keyed(lStar)
      val wK = Window.partitionBy(keyCols(kd): _*)
      val pos = kd.withColumn("grp", count(lit(1)).over(wK))
        .where($"grp" >= 2)
        .select($"doc_id", $"i")
      pos.hint("SHUFFLE_HASH").join(base, Seq("doc_id"))
        .select($"doc_id",
          expr(s"substring(encode(text, 'UTF-8'), cast(i + 1 as int), $lStar)")
            .as("gb"))
        .groupBy($"gb")
        .agg(count(lit(1)).as("n_occ"), countDistinct($"doc_id").as("n_docs"))
        .select(lit(lStar.toLong).as("lmax"), fmtG($"gb").as("g"), $"n_occ", $"n_docs")
        .orderBy($"g")
    }
  }
  /** C36 URL-level dedup — the canonicalization stage a crawl pipeline
    * runs BEFORE any content is fetched or hashed: the same page is
    * reached under many URL spellings (mixed-case scheme/host, explicit
    * default port, tracking parameters, fragments, trailing slashes,
    * reordered query strings), and collapsing those to one canonical URL
    * is what keeps the fetch frontier and the content-dedup index from
    * inflating. Crawl variants are synthesized from the fixture — every
    * doc gets a messy primary spelling, even-id docs a trailing-slash
    * recrawl, mod-3 docs an rss-referral recrawl — so canonical groups of
    * size 1, 2 and 3 all occur. Canonicalization: lowercase scheme+host,
    * strip :443/:80 default ports, drop the fragment, remove
    * utm_* / ref / fbclid tracking params, sort surviving query params,
    * trim the trailing slash. Keep-lowest-crawl-id per canonical URL.
    *
    * Scale shape: canonicalization is per-row string work that whole-stage
    * codegen fuses into the scan (no UDF — `filter`/`array_sort`/
    * `array_join` are native higher-order functions); the only shuffle is
    * ONE hash aggregate on the canonical URL. At 100 TB frontier scale
    * this is the cheapest dedup tier — no joins, no index.
    */
  def urlDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    urlDedupFrom(Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"lang"))
  }

  /** The canonicalization expression itself, over any URL column —
    * exposed separately so laws can pin its idempotence (canonicalizing
    * a canonical URL is the identity — the property that makes the
    * frontier dedup safe to re-run over already-clean URLs).
    */
  private[llm] def canonicalUrl(url: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val host = regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)),
      ":(443|80)$", "")
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z]+://[^/?#]+(/[^?#]*)", 1), "/$", "")
    val qs = filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      p => !p.rlike("^(utm_[a-z]+|ref|fbclid)=") && p =!= "")
    concat(scheme, lit("://"), host, path,
      when(size(qs) > 0, concat(lit("?"), array_join(array_sort(qs), "&")))
        .otherwise(lit("")))
  }

  /** Composable form over any (doc_id, source, lang) frame — the seam
    * the 10× scale probe drives (ScaleProbe convention).
    */
  def urlDedupFrom(d: DataFrame): DataFrame = {
    import d.sparkSession.implicits._
    // ONE corpus pass (r18, from the committed scan-census sweep —
    // tools/scan_census.py): the former three filtered branches
    // (primary + even-id recrawl + mod-3 rss recrawl) unioned three
    // SCANS of the same input; each row now emits its 1–3 crawl
    // variants as an exploded array built map-side. slice(…, 1, 0/1)
    // keeps or drops the conditional variants with the element type
    // intact (an empty `array()` literal would be array<null> and fail
    // coercion into concat). Row set identical to the old union —
    // same (crawl_id, url) pairs, order irrelevant under the aggregate.
    val variants = d.select(explode(concat(
      array(struct(($"doc_id" * 10).as("crawl_id"),
        concat(lit("https://"), $"source", lit(".Example.COM:443/docs/"),
               $"doc_id", lit("?utm_source=feed&lang="), $"lang",
               lit("#sec1")).as("url"))),
      slice(array(struct(($"doc_id" * 10 + 1).as("crawl_id"),
        concat(lit("HTTPS://"), $"source", lit(".example.com/docs/"),
               $"doc_id", lit("/?lang="), $"lang",
               lit("&utm_campaign=x")).as("url"))),
        lit(1), when($"doc_id" % 2 === 0, 1).otherwise(0)),
      slice(array(struct(($"doc_id" * 10 + 2).as("crawl_id"),
        concat(lit("https://"), $"source", lit(".example.com/docs/"),
               $"doc_id", lit("?lang="), $"lang", lit("&ref=rss")).as("url"))),
        lit(1), when($"doc_id" % 3 === 0, 1).otherwise(0))
    )).as("v")).select($"v.crawl_id", $"v.url")
    variants.withColumn("canonical_url", canonicalUrl($"url"))
      .groupBy($"canonical_url")
      .agg(min($"crawl_id").as("keep_crawl"),
           count(lit(1)).as("n_variants"))
      .orderBy($"keep_crawl")
  }

  /** C36d corpus snapshot diff — the dataset-versioning audit between
    * two releases of a corpus: which documents were added, removed,
    * changed (same id, different bytes), or carried unchanged — the
    * artifact a training-data release process publishes with every
    * refresh. Simulated from the fixture: snapshot A is docs < 450 with
    * docs 100–119 in an "old" revision (marker suffix); snapshot B is
    * docs ≥ 50 as-is — so all four statuses occur with known counts.
    *
    * Scale shape: ONE full-outer equi-join on doc_id between the two
    * snapshot scans comparing md5 content hashes — both sides shuffle
    * once on the id (or zero times when snapshots are stored bucketed by
    * doc_id, the layout the bucketed-join gate pins); the census is a
    * 4-row aggregate above it. Nothing compares text bytes across the
    * wire — only 16-byte hashes move.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    val a = docs.filter($"doc_id" < 450)
      .withColumn("text",
        when($"doc_id" >= 100 && $"doc_id" < 120,
             concat($"text", lit(" [rev1]"))).otherwise($"text"))
      .select($"doc_id", md5(encode($"text", "UTF-8")).as("ha"))
    val b = docs.filter($"doc_id" >= 50)
      .select($"doc_id", md5(encode($"text", "UTF-8")).as("hb"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when($"ha".isNull, "added")
          .when($"hb".isNull, "removed")
          .when($"ha" === $"hb", "unchanged")
          .otherwise("changed"))
      .groupBy($"status")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("first_id"),
           max($"doc_id").as("last_id"))
      .orderBy($"status")
  }

  /** C37 near-dup via MinHash + LSH banding, exact-Jaccard verified.
    *
    * Pipeline: 3-gram shingles → 128 MinHash values per doc (xxhash64
    * seeded by permutation index — Spark-internal, never compared to the
    * oracle) → 32 bands × 4 rows, band signature = hash of the 4 minima →
    * candidate pairs = equi-join on (band, signature) → exact Jaccard on
    * the candidates only → keep J ≥ 0.6 (integer form 5·inter ≥ 3·uni).
    *
    * The oracle computes the same J ≥ 0.6 pairs by brute force in SQL;
    * the two agree iff LSH recall is 1.0 at the threshold. With b=32, r=4
    * the miss probability at J = 0.96 (the corpus's near-dup band — the
    * fixture has a clean gap, nothing between J ≈ 0.12 and J ≈ 0.96) is
    * (1 − 0.96⁴)³² ≈ 1e-26.
    */
  def dedupNearMinhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    nearDupPairs(spark, dir).orderBy($"d1", $"d2")
  }

  /** The MinHash pipeline WITHOUT the gate's total order — consumers like
    * [[dedupClusters]] re-shuffle immediately, so the global sort would
    * be pure wasted work for them.
    *
    * MEMOIZED per (session, dir) — round 9: four gates consume this
    * exact pipeline (`llm_dedup_minhash`, `llm_dedup_clusters`,
    * `llm_dedup_editdist`, and the survivors policy via clusters), and
    * each previously re-ran the shingle/banding/verify chain from the
    * scan. The verified pair frame is tiny (LSH-bounded), so the cache
    * pins a few hundred rows while the build is paid once — same
    * contract and same Bench-sweep-survival (`pinRetained`) as
    * [[SuffixIndex]]; see COVERAGE.md's bench-attribution note.
    */
  private val pairsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  graft.state.Materialize.registerSessionCache(() => pairsCache.clear())

  private[graft] def nearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    graft.state.Materialize.purgeStopped(pairsCache)(_._1)
    pairsCache.computeIfAbsent((spark, dir), _ =>
      nearDupPairsUncached(spark, dir)
        .transform(graft.state.Materialize.pinRetained))
  }

  private def nearDupPairsUncached(spark: SparkSession, dir: String): DataFrame =
    nearDupPairsFrom(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")))

  /** The MinHash+LSH near-dup pair pipeline over any (doc_id, text)
    * corpus — the from-frame twin of [[nearDupPairs]] (same shape the
    * suffix/winnow families expose), consumed by the dir-keyed gate
    * above and the `near_dedup` pipeline processor
    * ([[graft.pipeline.NearDedupProcessor]]). Entirely lazy: banding,
    * the bucket equi-join, and the exact Jaccard verify are one
    * declarative plan (no actions), so it composes inside a pipeline
    * fold and Catalyst optimizes across the processor boundary.
    */
  private[graft] def nearDupPairsFrom(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // Raw (non-distinct) shingles: min() and collect_set() dedup
    // inherently, so the pre-aggregation distinct shuffle is pure waste.
    val sh = shinglesFrom(docs, 3, distinct = false)
    val buckets = minhashBuckets(sh)
    val cand = buckets.select($"doc_id".as("d1"), $"band", $"bucket")
      .join(buckets.select($"doc_id".as("d2"), $"band", $"bucket"), Seq("band", "bucket"))
      .filter($"d1" < $"d2")
      .select($"d1", $"d2").distinct()
    // Exact verify on candidates only; set size derived from the set
    // itself (no distinct shuffle anywhere in this pipeline).
    val sets = sh.groupBy($"doc_id").agg(collect_set($"s").as("ss"))
      .withColumn("n", size($"ss").cast("long"))
    cand
      .join(sets.select($"doc_id".as("d1"), $"ss".as("s1"), $"n".as("n1")), Seq("d1"))
      .join(sets.select($"doc_id".as("d2"), $"ss".as("s2"), $"n".as("n2")), Seq("d2"))
      .withColumn("inter", size(array_intersect($"s1", $"s2")).cast("long"))
      .withColumn("uni", $"n1" + $"n2" - $"inter")
      .filter($"inter" * 5 >= $"uni" * 3)
      .select($"d1", $"d2", $"inter", $"uni")
  }

  /** The LSH banding subtree of [[nearDupPairs]] — (doc_id, band, bucket),
    * 32 rows per doc — factored out so [[PairCountProbe]] can measure
    * bucket-size distribution (candidate fanout = Σ C(size,2) per group)
    * without re-deriving the pipeline.
    *
    * The 128-wide MinHash signature as 128 min() aggregates in ONE
    * codegen'd hash aggregate — map-side partial minima, so the shuffle
    * carries one 128-long buffer per doc, not |shingles|×128 exploded
    * rows. The permutation family is double-hashed: the variable-length
    * shingle STRING is hashed once, and the 128 per-permutation hashes
    * run over that fixed 8-byte long — far cheaper than 128 UTF-8
    * traversals per shingle. Kept SEPARATE from nearDupPairs' collect_set
    * aggregate on purpose: collect_set is a TypedImperativeAggregate, and
    * mixing it in forces the whole aggregate into non-codegen
    * ObjectHashAggregate (measured ~2× slower). NOTE: >100 output fields —
    * needs spark.sql.codegen.maxFields raised (Verify/Bench set 220) or
    * this drops out of whole-stage codegen anyway. 32 bands of 4 rows;
    * the band signature hashes the 4 minima in position order so equal
    * signatures ⇔ equal band slices; stack() unpivots to (doc, band,
    * bucket).
    */
  private[graft] def minhashBuckets(sh: DataFrame): DataFrame = {
    import sh.sparkSession.implicits._
    val numPerm = 128
    val numBands = 32 // × 4 rows
    val hashed = sh.select($"doc_id", xxhash64($"s").as("h"))
    val sig = hashed.groupBy($"doc_id")
      .agg(min(xxhash64($"h", lit(0))).as("mh0"),
           (1 until numPerm).map(i => min(xxhash64($"h", lit(i))).as(s"mh$i")): _*)
    val bandCols = (0 until numBands).map { b =>
      s"$b, xxhash64(mh${4 * b}, mh${4 * b + 1}, mh${4 * b + 2}, mh${4 * b + 3})"
    }.mkString(", ")
    sig.select($"doc_id",
      expr(s"stack($numBands, $bandCols)").as(Seq("band", "bucket")))
  }

  /** Document-frequency cap for [[jaccardNgram]]'s inverted index: a
    * shingle appearing in more than this many documents is a
    * stop-shingle and is dropped from the index — AND from the Jaccard
    * universe, identically in both engines, so the gate stays exact.
    *
    * The GATED queries pin this constant because the cap is part of the
    * operator definition the DuckDB oracle mirrors. A deployment whose
    * corpus drifts should not hand re-tune it: [[selectDfCap]] derives
    * the cap from the key census instead, and [[jaccardPairsAuto]] /
    * [[graft.ops.llm.TextStats.winnowPairsAutoFrom]] are the
    * census-driven entry points.
    */
  private[llm] val JaccardDfCap = 64L

  /** Census-driven document-frequency cap selection — the round-7 review
    * item "wire the skew census into a cap rule so a df-distribution
    * shift doesn't need a hand re-tune". The rule bounds the pair join's
    * OUTPUT, which is what actually degenerates: a key of document
    * frequency df emits df² ordered candidate pairs, so the join's total
    * fanout over a capped index is Σ_{df ≤ cap} df². Selection walks the
    * log₂-bucketed df census ([[graft.ops.Skew.keyStatsQ]]'s device —
    * one aggregate over the key plus a ≤64-row histogram, collected:
    * bounded driver probe) from small buckets up, and keeps raising the
    * cap while that cumulative fanout stays within
    * `pairBudgetPerRow × index-rows` — i.e. the join may amplify its
    * input at most `pairBudgetPerRow`-fold NO MATTER how the df
    * distribution shifts. More duplication ⇒ hot buckets exceed the
    * budget sooner ⇒ the cap tightens automatically (the r6 2-gram
    * incident, automated away); a clean corpus keeps effectively no cap.
    * `floor` guards the degenerate all-duplicate corpus (cap never drops
    * below pair-forming df = 2).
    */
  private[ops] def selectDfCap(index: DataFrame, key: Column,
                               pairBudgetPerRow: Long = 32L,
                               floor: Long = 2L): Long = {
    val hist = index.groupBy(key.as("k")).agg(count(lit(1)).as("df"))
      .groupBy(length(bin(col("df"))).cast("long").as("bucket"))
      .agg(sum(col("df") * col("df")).as("pairs"), sum(col("df")).as("rows"))
      .orderBy(col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val budget = pairBudgetPerRow * hist.map(_._3).sum
    var cum = 0L
    var cap = floor
    hist.foreach { case (bucket, pairs, _) =>
      cum += pairs
      // bucket b holds df ∈ [2^(b−1), 2^b − 1]
      if (cum <= budget) cap = math.max(cap, (1L << bucket) - 1)
    }
    cap
  }

  /** [[jaccardPairs]] with the cap chosen by [[selectDfCap]] from the
    * shingle census — the corpus-parametric deployment form (the gate
    * keeps the pinned [[JaccardDfCap]] for oracle parity).
    */
  private[ops] def jaccardPairsAuto(sh: DataFrame): DataFrame =
    jaccardPairs(sh, selectDfCap(sh, col("s")))

  /** The inverted-index Jaccard pair join over an already-shingled
    * `(doc_id, s)` DataFrame — factored out so the skew test can drive
    * it with an adversarial hot shingle.
    *
    * The self-join's per-shingle cost is df² (every pair of docs sharing
    * the shingle), so ONE hot shingle degenerates the whole join
    * quadratically (measured at sf0.1: 23s with 2-gram shingles whose df
    * is corpus-wide vs ~1s with discriminative 4-grams). The df cap
    * bounds that by construction: drop shingles with df > cap BEFORE the
    * join and the per-shingle cost is ≤ cap² regardless of corpus skew —
    * the standard stop-shingle mitigation. Sizes are computed over the
    * capped universe too, so the J ≥ 0.5 threshold stays a true Jaccard
    * (of the capped shingle sets), not a mixed-universe ratio.
    */
  private[ops] def jaccardPairs(sh: DataFrame, cap: Long): DataFrame = {
    // df via a count window over s: ONE shuffle of the shingle table
    // (which the self-join below needs on the same key anyway) instead
    // of a separate aggregate + join-back. The capped frame then has
    // THREE consumers (sizes + both self-join sides) — unpinned,
    // Catalyst duplicates the whole shingle→distinct→window subtree per
    // consumer (r17 plan capture: 3 scans, 3 Generates, 3 window sorts),
    // so the pin runs it exactly once. The window (not a collect_set
    // posting list) stays the df device on purpose: an uncapped hot
    // shingle spills through WindowExec's external sorter, where a
    // posting-list buffer would hold every doc_id of the hot key in one
    // aggregation buffer.
    val kept = graft.state.Materialize.pin(sh.withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("s"))))
      .filter(col("df") <= cap).drop("df"))
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = kept.select(col("doc_id").as("d1"), col("s"))
      .join(kept.select(col("doc_id").as("d2"), col("s")), Seq("s"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
      .withColumn("uni", col("n1") + col("n2") - col("inter"))
      .filter(col("inter") * 2 >= col("uni"))
      .select(col("d1"), col("d2"), col("inter"), col("uni"))
  }

  /** Exact n-gram Jaccard similarity join (word 4-grams, J ≥ 0.5 over the
    * df-capped shingle universe) via the inverted-index form: self-join
    * on the shingle (shuffle on shingle, never all-pairs), count
    * co-occurrences per pair, then the integer threshold 2·inter ≥ uni.
    * The exact sparse twin of [[dedupNearMinhash]].
    *
    * Shingle width matters at scale: an inverted-index join is linear
    * only while shingles are discriminative (31-word vocabulary: 2-grams
    * are all hot, measured 23s vs ~1s for 4-grams at sf0.1). Width picks
    * the common case; the [[JaccardDfCap]] bounds the adversarial one.
    */
  def jaccardNgram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    jaccardPairs(shingles(spark, dir, 4, distinct = true), JaccardDfCap)
      .orderBy($"d1", $"d2")
  }

  /** C37 (variant) SimHash near-dup: 32-bit signatures from md5-derived
    * shingle hashes (cross-engine reproducible), candidate pairs from the
    * 4-block pigeonhole banding (exact for hamming ≤ 3), verified with
    * bit_count(xor).
    */
  /** The pinned per-doc 32-bit SimHash signature frame — factored out
    * (r18) so [[PairCountProbe]] can census the banding-key
    * distribution over the exact production frame (VERDICT r17 #5).
    */
  private[llm] def simhashSignatures(spark: SparkSession,
                                     dir: String): DataFrame = {
    import spark.implicits._
    // 60-bit base hash both engines can compute (CrossHash; native form —
    // one digest, no hex-string round trip, per distinct shingle).
    graft.functions.GraftFunctions.register(spark)
    val hv = shingles3(spark, dir)
      .select($"doc_id", expr(CrossHash.hex60Native("s")).as("hv"))
    // All 32 sign counters in ONE codegen'd hash aggregate (32
    // conditional sums) instead of exploding ×32 and shuffling
    // |shingles|×32 rows; the signature assembles in the projection.
    // Pinned: the signature frame feeds BOTH sides of the banding
    // self-join below — unpinned, the shingle→hash→32-sum aggregate
    // subtree ran twice per query (r17 plan capture: two identical
    // scan→Generate→agg towers). One row per doc, so the pin is tiny.
    graft.state.Materialize.pin(hv.groupBy($"doc_id")
      .agg(sum(when(expr("shiftright(hv, 0) & 1") === 1, 1).otherwise(-1)).as("b0"),
           (1 until 32).map(i =>
             sum(when(expr(s"shiftright(hv, $i) & 1") === 1, 1).otherwise(-1)).as(s"b$i")): _*)
      .select($"doc_id",
        (0 until 32).map(i => when(col(s"b$i") >= 0, lit(1L << i)).otherwise(0L))
          .reduce(_ + _).as("sh32")))
  }

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sig = simhashSignatures(spark, dir)
    // hamming(a,b) ≤ 3 on 32 bits ⇒ one of the 4 disjoint bytes matches.
    val blk = sig.select($"doc_id", $"sh32", explode(expr("sequence(0, 3)")).as("j"))
      .withColumn("bv", expr("shiftright(sh32, cast(8 * j as int)) & 255"))
    blk.select($"doc_id".as("d1"), $"sh32".as("h1"), $"j", $"bv")
      .join(blk.select($"doc_id".as("d2"), $"sh32".as("h2"), $"j", $"bv"), Seq("j", "bv"))
      .filter($"d1" < $"d2")
      .select($"d1", $"d2", $"h1", $"h2").distinct()
      .withColumn("hamming", expr("cast(bit_count(h1 ^ h2) as bigint)"))
      .filter($"hamming" <= 3)
      .select($"d1", $"d2", $"hamming")
      .orderBy($"d1", $"d2")
  }

  /** C37 (completion): duplicate-CLUSTER resolution. Pairs are not a
    * dedup policy — a near-dup chain a~b~c must collapse to ONE kept
    * document, so the pair graph needs connected components.
    * [[starComponents]] over the [[dedupNearMinhash]] pairs: every
    * clustered doc maps to its component's smallest doc_id (the
    * canonical survivor). Star contraction converges in O(log² n)
    * rounds on ANY pair-graph topology — including the adversarial
    * chain-shaped near-dup graphs (page-sequence shingle drift) that
    * made the round-8 diameter-bound propagation the named scale risk.
    *
    * The oracle resolves the same components with a recursive CTE, so the
    * gate checks graph semantics, not implementation.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    starComponents(nearDupPairs(spark, dir).select($"d1", $"d2"))
      .select($"doc".as("doc_id"), $"lab".as("cluster_rep"))
      .orderBy($"doc_id")
  }

  /** Connected components over an undirected pair list `(d1, d2)` →
    * `(doc, lab)` with `lab` = the component's minimum id. Shared by the
    * MinHash cluster resolution ([[dedupClusters]]), the semantic-dedup
    * grouping ([[semDedup]]) and the general-graph census
    * ([[graft.ops.Graph]] `graph_components`).
    *
    * Algorithm: alternating large-star / small-star contraction
    * (Kiveris et al. 2014, "Connected Components in MapReduce and
    * Beyond") — the round-8 min-label propagation it replaces was
    * DIAMETER-bound (measured 33 hops at sf0.1 on the chain-like
    * co-occurrence giant; an adversarial long-chain graph at 100 TB
    * would make it the engine's slowest operator), while star
    * contraction converges in O(log² n) rounds on ANY topology:
    *   - large-star(u): every neighbor v > u re-attaches to
    *     m = min(Γ(u) ∪ {u}) — new edge (v, m);
    *   - small-star(u): every neighbor v ≤ u, and u itself, attach to
    *     m = min of the small side.
    * Both are one groupBy + one keyed join over the edge list — no
    * windows, no driver graph; each keeps connectivity invariant
    * (every rewritten edge routes through the shared minimum) and
    * monotonically contracts toward the star forest whose centers are
    * the component minima, which is a fixed point of BOTH operations.
    *
    * Convergence witness: the canonical edge-set fingerprint
    * (count, bit_xor of per-edge xxhash64) unchanged by a large-star
    * AND by the following small-star — set-level stability of each
    * operation individually, the paper's termination condition (a
    * composition-level check alone could in principle declare a 2-cycle
    * converged). A coverage `require` asserts every input vertex
    * surfaces in the output exactly once.
    */
  /** Edge-count bound under which [[starComponents]] resolves the graph
    * driver-locally (union-find over the collected edge list) instead of
    * running the distributed contraction — the TextRank precedent: a
    * BOUNDED driver probe with a law-tested distributed fallback. The
    * near-dup / semantic pair graphs are LSH/cell-bounded (hundreds of
    * edges at fixture scale; production pair graphs are pruned by the
    * same candidate machinery), so paying ~6 distributed shuffle rounds
    * of fixed overhead for them is pure waste; anything above the bound
    * — or any deployment that sets `spark.graft.cc.localEdgeMax=0` —
    * takes the O(log² n) contraction path. GraphSpec proves both paths
    * agree exactly on adversarial topologies.
    */
  private val CcLocalEdgeMaxKey = "spark.graft.cc.localEdgeMax"

  private def starComponentsLocal(edges: Array[(Long, Long)],
                                  spark: SparkSession): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElseUpdate(x, x) != x) x = parent(x)
      var y = x0 // path compression, iterative (200k-long chains recurse-safe)
      while (parent(y) != x) { val n = parent(y); parent(y) = x; y = n }
      x
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.toSeq.map(k => (k, find(k))).toDF("doc", "lab")
  }

  /** One large-star contraction round — lifted to object level (r15) so
    * PlanSpec can pin its never-broadcast posture on the exact
    * production join. The per-vertex minima frames are VERTEX-sized
    * (corpus-scale at 100 TB) — SHUFFLE_HASH-pinned so AQE cannot flip
    * these joins to broadcast while the fixture sits under the
    * threshold (r14, the same super-linear per-task-build hazard the
    * graph weak-scaling probe measured on the triangle wedge join).
    */
  private[graft] def largeStarStep(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    val sym = df.select($"u", $"v")
      .union(df.select($"v".as("u"), $"u".as("v")))
    val mins = sym.groupBy($"u").agg(min($"v").as("mv"))
      .select($"u", least($"mv", $"u").as("m"))
    sym.join(mins.hint("SHUFFLE_HASH"), Seq("u")).where($"v" > $"u")
      .select($"v".as("u"), $"m".as("v")).distinct()
  }

  /** One small-star contraction round — see [[largeStarStep]] for the
    * SHUFFLE_HASH posture rationale. */
  private[graft] def smallStarStep(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    val dir = df.select(greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
    val mins = dir.groupBy($"u").agg(min($"v").as("m"))
    dir.join(mins.hint("SHUFFLE_HASH"), Seq("u"))
      .select($"v".as("u"), $"m".as("v"))
      .union(mins.select($"u", $"m".as("v")))
      .where($"u" =!= $"v").distinct()
  }

  private[graft] def starComponents(pairs: DataFrame,
                                    maxRounds: Int = 100): DataFrame = {
    import pairs.sparkSession.implicits._
    val spark = pairs.sparkSession
    var e = pairs.select($"d1".as("u"), $"d2".as("v"))
      .where($"u" =!= $"v").distinct()
      .transform(graft.state.Materialize.pin)
    val nEdges = e.count()
    val localMax = spark.conf.get(CcLocalEdgeMaxKey, "200000").toLong
    if (nEdges <= localMax) {
      val collected = e.select($"u", $"v").as[(Long, Long)].collect()
      // the edge pin is DEAD once collected — release it (blocks, and in
      // reliable mode its checkpoint FILES, which ContextCleaner never
      // deletes; a foreach_batch caller would otherwise accrue one edge
      // frame per micro-batch — VERDICT r13 #3)
      graft.state.Materialize.releasePinned(e)
      return starComponentsLocal(collected, spark)
    }
    // pin-mode autopilot from the measured edge-pin bytes (VERDICT r15
    // #3, see Graph.pagerankFrom): the contraction's round pins upgrade
    // to reliable checkpoint files past the single-JVM GC cliff; an
    // explicit session mode always wins
    val pinLoop: DataFrame => DataFrame = {
      val mode = graft.state.Materialize.loopMode(e)
      df => graft.state.Materialize.pinWith(df, mode)
    }
    // vertex domain = vertices incident to ≥1 NON-self edge (derived from
    // the filtered frame `e`, not the raw pairs): a vertex appearing only
    // in self-pairs is not part of the pair graph, on BOTH paths — the
    // local union-find (which collects `e`) already had this semantics,
    // and deriving the coverage denominator from raw pairs made the
    // distributed require() disagree with it (ADVICE r9)
    val verts = e.select($"u").union(e.select($"v".as("u")))
      .distinct().transform(graft.state.Materialize.pin)
    val nVerts = verts.count()
    // only the COUNT is consumed downstream — the vertex pin is dead now
    graft.state.Materialize.releasePinned(verts)
    // canonical set fingerprint — orientation-free, order-free
    def fp(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(least($"u", $"v"), greatest($"u", $"v"))),
          lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    def largeStar(df: DataFrame): DataFrame = largeStarStep(df)
    def smallStar(df: DataFrame): DataFrame = smallStarStep(df)
    val dbg = java.lang.Boolean.getBoolean("graft.graph.debug")
    var prev = fp(e)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // one pin + one fingerprint per (large ∘ small) round; stability
      // of the COMPOSITION triggers the (rare) per-op confirmation
      // below instead of paying a mid-round materialization every round
      val next = smallStar(largeStar(e)).transform(pinLoop)
      val fpS = fp(next)
      if (fpS == prev) {
        // composition-stable: confirm large-star alone is also stable
        // (the paper's termination is per-op; a composition 2-cycle,
        // while never observed, would otherwise terminate early)
        converged = fp(largeStar(next)) == prev
      }
      prev = fpS
      // `next` is pinned (eager in both modes), so the prior round's
      // edge pin is superseded — release it, or an R-round contraction
      // leaves R dead pins (and R checkpoint-file sets in reliable mode)
      graft.state.Materialize.releasePinned(e)
      e = next
      round += 1
      if (dbg) println(s"[star-components] round $round fp=$fpS")
    }
    require(converged, s"star contraction did not converge in $round rounds")
    // star forest: every non-minimum vertex carries exactly one edge to
    // its component minimum; the minima label themselves
    val labels = e.select($"u".as("doc"), $"v".as("lab"))
      .union(e.select($"v").distinct().select($"v".as("doc"), $"v".as("lab")))
    val out = labels.transform(pinLoop)
    val covered = out.count()
    require(covered == nVerts,
      s"star contraction lost vertices: $covered labels for $nVerts vertices")
    // `out` is materialized — the converged edge frame is superseded too
    graft.state.Materialize.releasePinned(e)
    out
  }

  /** The IVF coarse-quantizer cell count is a CORPUS-SCALED parameter
    * (VERDICT r16 #1 — the former hard-coded `IvfCells = 4` made a cell
    * corpus/4 vectors at ANY scale, so the per-cell verify degenerated
    * toward all-pairs: the r16 independent-content rungs measured the
    * resulting m² per-MB cost). Resolution, in [[ivfCellsFor]]:
    *
    *  1. [[IvfCellsKey]] set → that K (explicit always wins — the probe
    *     and any deployment that has already sized its index set this).
    *  2. else K = max([[IvfMinCells]], ceil(rows / target)) where
    *     target = [[IvfTargetCellRowsKey]] (conf, else
    *     [[IvfTargetCellRowsEnv]], else 2^16); target ≤ 0 pins K to the
    *     floor. The row count is ONE metadata-cheap count per distinct
    *     corpus plan, memoized per session.
    *
    * The centroid planes are the same md5 formula at every K
    * ([[ivfCentroids]]), so K = 4 reproduces the gate fixture
    * bit-identically — all fixture corpora sit far under the default
    * target, which is how the DuckDB oracles (which rebuild exactly the
    * 4 floor planes in SQL) stay byte-stable while a 100 TB corpus gets
    * rows/2^16 cells and therefore CONSTANT expected occupancy: the
    * within-cell pairwise verify is O(occ) per vector and the coarse
    * assignment O(K·dim) per vector — the classic IVF trade, with the
    * occupancy-held flatness measured in [[ScaleProbe]]'s
    * `weak-ann-kheld-*` rungs.
    */
  val IvfCellsKey = "spark.graft.ivf.cells"
  val IvfTargetCellRowsKey = "spark.graft.ivf.targetCellRows"
  val IvfTargetCellRowsEnv = "SPARK_GRAFT_IVF_TARGET_CELL_ROWS"

  /** Autopilot target occupancy (rows per cell): 2^16 × 64-dim doubles
    * ≈ 34 MB of vectors per cell — one executor task's working set for
    * search, and a ~2×10^9-dot worst case for a within-cell exact
    * verify group (minutes, not hours, of one core). Deployments
    * verifying at tighter thresholds size it down via the conf.
    */
  val IvfTargetCellRowsDefault: Long = 1L << 16

  /** Quantizer floor AND the gate-fixture cell count: the DuckDB
    * oracles rebuild exactly these 4 md5 planes in SQL, and every
    * fixture corpus resolves to the floor under the default target.
    */
  private[graft] val IvfMinCells = 4

  /** Memoized corpus row counts for [[ivfCellsFor]], keyed by the
    * CANONICALIZED logical plan (two references to the same corpus —
    * e.g. the cells frame and the probe frame of one search — must
    * resolve the SAME K, and the count must not re-run per reference).
    */
  private val ivfCountCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
    java.lang.Long]()
  graft.state.Materialize.registerSessionCache(() => ivfCountCache.clear())

  /** Resolve the coarse-quantizer cell count for a FULL corpus frame —
    * see [[IvfCellsKey]]. Call once per operation at the top level and
    * thread K down: resolving from a SUB-FILTERED frame (e.g. a query
    * subset) would disagree with the corpus side's quantizer.
    */
  private[graft] def ivfCellsFor(corpus: DataFrame): Int = {
    val spark = corpus.sparkSession
    val conf = spark.conf
    def loudLong(src: String, raw: String, what: String): Long =
      try raw.trim.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$src: expected $what (a long), got '$raw'")
      }
    conf.getOption(IvfCellsKey) match {
      case Some(raw) =>
        val k = loudLong(IvfCellsKey, raw, "a cell count >= 1")
        require(k >= 1 && k <= Int.MaxValue,
          s"$IvfCellsKey must be in [1, ${Int.MaxValue}], got $k")
        k.toInt
      case None =>
        val (src, raw) = conf.getOption(IvfTargetCellRowsKey)
          .map((IvfTargetCellRowsKey, _))
          .orElse(sys.env.get(IvfTargetCellRowsEnv)
            .map((IvfTargetCellRowsEnv, _)))
          .getOrElse(("default", IvfTargetCellRowsDefault.toString))
        val target = loudLong(src, raw,
          "a target rows-per-cell (<= 0 pins K to the floor)")
        if (target <= 0) IvfMinCells
        else {
          graft.state.Materialize.purgeStopped(ivfCountCache)(_._1)
          val n: Long = ivfCountCache.computeIfAbsent(
            (spark, corpus.queryExecution.logical.canonicalized),
            _ => corpus.count())
          val k = math.max(IvfMinCells.toLong, (n + target - 1) / target)
          require(k <= Int.MaxValue,
            s"IVF cell count $k overflows Int (rows=$n, target=$target)")
          k.toInt
        }
    }
  }

  /** Embedding dimensionality the IVF quantizer (and hence every
    * embedding-family operator) is built for — the fixture's dimension.
    */
  private[graft] val IvfDim = 64

  /** ONE spelling of the strict LEFT-TO-RIGHT primitive dot fold — the
    * IEEE-754 sequence every embedding engine path must share (the
    * native `graft_dot` expression, DuckDB's `list_reduce`, the pair
    * engines' verify loops, the quantizer's cell assignment): the
    * bit-identity between the gates and the processors rests on all of
    * them performing the identical addition chain, so the JVM loop
    * exists exactly once (self-review r13 pass 1 — [[embeddingPairs]]
    * and [[embeddingProbeEdges]] briefly carried verbatim copies). A
    * function VALUE, not a method, so closures capture it by value
    * instead of dragging the enclosing object into task serialization.
    */
  private val dotLR: (Array[Double], Array[Double]) => Double = (a, b) => {
    var acc = 0.0
    var d = 0
    while (d < a.length) { acc += a(d) * b(d); d += 1 }
    acc
  }

  /** The IVF coarse-quantizer centroids: K × 64 md5-derived components in
    * [−1, 1) — the same deterministic-plane trick as [[Similarity]]'s LSH
    * hyperplanes, so any engine (or a re-run on any cluster) builds the
    * identical quantizer. O(K·dim) driver work; no corpus data involved.
    * The formula is per-(cell, dim), so a larger K EXTENDS the plane
    * set: cells 0..3 are byte-identical at every K, which is what keeps
    * the K = 4 gate oracles (which rebuild those planes in SQL) stable
    * while production K scales with the corpus (VERDICT r16 #1).
    * Memoized per K — the probe's occupancy-held ladder resolves
    * several K values in one session.
    */
  private val ivfCentroidCache = new java.util.concurrent.ConcurrentHashMap[
    Int, Array[Array[Double]]]()
  private def ivfCentroids(k: Int): Array[Array[Double]] =
    ivfCentroidCache.computeIfAbsent(k, kk =>
      Array.tabulate(kk, IvfDim) { (c, d) =>
        CrossHash.hex60Jvm(s"ivf_${c}_$d").toDouble / 576460752303423488.0 - 1.0
      })

  /** Embedding-cosine near-dup (pairs with cosine ≥ 0.45).
    *
    * Physical form (round-3 rewrite — VERDICT r2 #2 flagged the previous
    * broadcast-the-collected-corpus version as a driver-memory
    * scale-killer): an IVF-style coarse quantizer with NO driver
    * materialization.
    *
    *  1. Assign each vector its cell = argmax dot against the K
    *     deterministic [[ivfCentroids]] (per-partition tight loop; the
    *     centroid table is O(K·dim) and broadcast, never the corpus).
    *  2. Replicate each vector to every unordered cell pair containing
    *     its cell (K copies) and shuffle on the pair id — so EVERY
    *     corpus pair lands in exactly one group and the result stays
    *     EXACT against the brute-force oracle.
    *  3. Per cell-pair group, `groupByKey.flatMapGroups` runs the tight
    *     primitive verify loop (left-to-right accumulation — the same
    *     IEEE-754 sequence as DuckDB's `list_reduce` fold, so cosine
    *     values stay bit-identical; the declarative HOF form costs
    *     ~10µs/pair in allocation, measured 21–67s at sf0.1).
    *
    * Scale shape: executor memory is O(2·corpus/K) per group — bounded by
    * the quantizer's cell size, not the corpus; driver holds only the
    * K×64 centroid constants. Exact all-pairs work is inherently O(n²/K²)
    * per group × O(K²) groups; the production *approximate* mode prunes
    * to same-cell (or centroid-adjacent) pairs only — the standard IVF
    * recall trade — without changing this plumbing.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // deliberately UNCACHED: this exact-mode gate has a single consumer
    // (nothing shares its (0.45, all-pairs) parameters), and PlanSpec
    // pins that its construction stays lazy — the memoizing pin is an
    // eager materialization that would buy nothing here
    embeddingPairs(Similarity.corpus(spark, dir), thr = 0.45)
      .orderBy($"i", $"j")
  }

  /** Memoized gate-facing form of [[embeddingPairs]] — round 9:
    * `llm_dedup_embedding_approx` and `llm_semdedup` run the identical
    * (thr, sameCellOnly) cell-shuffle pair engine; the verified pair
    * frame is tiny, so cache it per (session, dir, params) with the
    * same sweep-surviving pin contract as [[nearDupPairs]].
    */
  private val embPairsCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Double, Boolean, Int), DataFrame]()
  graft.state.Materialize.registerSessionCache(() => embPairsCache.clear())

  private def embeddingPairsCached(spark: SparkSession, dir: String,
                                   thr: Double, sameCellOnly: Boolean): DataFrame = {
    graft.state.Materialize.purgeStopped(embPairsCache)(_._1)
    // the resolved cell count joins the key: a session that re-resolves
    // K (probe ladder, conf change) must not be served a pair frame
    // built under a different quantizer
    val corpus = Similarity.corpus(spark, dir)
    val k = ivfCellsFor(corpus)
    embPairsCache.computeIfAbsent((spark, dir, thr, sameCellOnly, k), _ =>
      embeddingPairs(corpus, thr, sameCellOnly)
        .transform(graft.state.Materialize.pinRetained))
  }

  /** The production APPROXIMATE mode of [[dedupEmbedding]]: candidates
    * are same-cell pairs only — each vector is emitted once under its
    * own cell's diagonal key instead of replicated to all K cell pairs,
    * cutting both the shuffle volume and the verify work by ~K× (the
    * standard IVF recall trade: a near-dup pair straddling a cell
    * boundary is missed). Same quantizer, same shuffle plumbing, same
    * tight verify loop as the exact mode; the oracle replays the cell
    * assignment in SQL and pairs within cells, and DedupSpec measures
    * recall vs the exact pair set (reported in COVERAGE.md).
    */
  def dedupEmbeddingApprox(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    embeddingPairsCached(spark, dir, thr = 0.45, sameCellOnly = true)
      .orderBy($"i", $"j")
  }

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023): group
    * embeddings into semantic-duplicate clusters — connected components
    * of the same-cell cosine graph at the near-dup threshold — and per
    * cluster KEEP the member least similar to its quantizer centroid
    * (the paper's policy: the least-redundant representative survives;
    * ties to the lowest vec_id). Composition of existing machinery:
    * the [[dedupEmbeddingApprox]] candidate graph, the shared
    * [[starComponents]] component resolution, and one rank window
    * for the keep policy — no new shuffle shapes.
    *
    * Cross-engine determinism: cos-to-centroid divides the same
    * left-to-right `graft_dot` fold by `nrm * |centroid|`, with the
    * centroid norm folded in the identical order on both engines, so
    * the rank window's float ordering cannot diverge.
    *
    * Scale notes: inherits the cell-shuffle pair engine's bounds
    * (executor memory O(corpus/K) per group, no driver
    * materialization); the contraction loop runs O(log²) rounds
    * over the (tiny) pair-connected subset only; the keep window
    * shuffles that subset once more.
    */
  def semDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val corpus = Similarity.corpus(spark, dir)
    val pairs = embeddingPairsCached(spark, dir, thr = 0.45, sameCellOnly = true)
      .select($"i".as("d1"), $"j".as("d2"))
    semDedupMembers(corpus, pairs)
      .where($"rn" === 1)
      .select($"lab".as("cluster_rep"), $"n_members".cast("long").as("n_members"),
        $"vec_id".as("keep_vec_id"))
      .orderBy($"cluster_rep")
  }

  /** [[semDedup]]'s member resolution over any `(vec_id, v, nrm)` corpus
    * and `(d1, d2)` same-cell pair frame — factored so the gate and the
    * YAML `sem_dedup` processor run the IDENTICAL cluster/keep machinery
    * (VERDICT r11 #4: pipeline and query surfaces must not diverge).
    * One row per PAIR-CONNECTED member: (vec_id, lab, cos_c, rn,
    * n_members); `rn = 1` is the SemDeDup keep policy — the member LEAST
    * similar to its own cell centroid survives (Abbas et al. 2023), ties
    * to the lowest id. Unconnected vectors don't appear (inner join);
    * callers keep them implicitly.
    */
  private[graft] def semDedupMembers(corpus: DataFrame, pairs: DataFrame): DataFrame =
    semDedupMembersScoped(corpus, pairs)._1

  /** [[semDedupMembers]] plus a release handle for the component-label
    * pin it consumes (the `starComponents` result — the one internal
    * pin that must outlive this method because the returned frame joins
    * it lazily). A per-micro-batch caller that EAGERLY materializes the
    * members frame (the `sem_dedup_clusters` processor pins its drop
    * set) calls the release right after, so reliable-mode checkpoint
    * files stay bounded across a foreach_batch loop (VERDICT r13 #3);
    * the once-per-session gate path uses the plain overload and lets
    * the label pin live.
    */
  private[graft] def semDedupMembersScoped(corpus: DataFrame, pairs: DataFrame)
      : (DataFrame, () => Unit) = {
    import corpus.sparkSession.implicits._
    val componentLabels = starComponents(pairs)
    val labels = componentLabels
      .select($"doc".as("vec_id"), $"lab")
    // broadcast the LABEL side explicitly: it is the pair-connected
    // subset (tiny by construction) but arrives as a checkpointed RDD
    // with no stats, so at test SF Catalyst instead broadcasts the
    // corpus side (parquet stats look small) — a corpus-sized build at
    // 100 TB. The hint pins the only join shape that scales.
    // cos_c is computed AFTER the join (self-review r12): Catalyst has
    // no rule to defer a pre-join projection, so computing it before
    // would pay a 64-dim dot + divide for every UNMATCHED corpus row.
    val k = ivfCellsFor(corpus)
    val members = withIvfCell(corpus, k)
      .join(broadcast(labels), Seq("vec_id"))
      .withColumn("cos_c", centroidCosCol(k))
    val byLab = org.apache.spark.sql.expressions.Window
      .partitionBy($"lab").orderBy($"cos_c", $"vec_id")
    val out = members
      .withColumn("rn", row_number().over(byLab))
      .withColumn("n_members", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"lab")))
    (out, () => graft.state.Materialize.releasePinned(componentLabels))
  }

  /** Centroid L2 norms — the ONE constant every centroid-cos consumer
    * shares: [[centroidCosCol]] embeds it as literals, and the pair
    * engines' withCentroidCos branches capture it as a local val into
    * their task closures (r13: the former executor-side recompute was
    * removed so exactly one spelling exists — same doubles either way,
    * but one definition can't drift).
    */
  private val ivfCentroidNormCache = new java.util.concurrent.ConcurrentHashMap[
    Int, Array[Double]]()
  private def ivfCentroidNorms(k: Int): Array[Double] =
    ivfCentroidNormCache.computeIfAbsent(k, kk =>
      ivfCentroids(kk).map(w => math.sqrt(w.map(x => x * x).sum)))

  /** Cosine to the vector's OWN cell centroid, as one CASE over the K
    * centroid literals — the same fold order as the oracle's
    * list_reduce, so the keep-policy ordering is engine-independent.
    * Requires `cell`, `v`, `nrm` columns ([[withIvfCell]] shape). A
    * COLUMN, not a frame transform, so callers apply it AFTER their
    * pair/label join and pay the 64-dim dot only for matched rows. The
    * SemDeDup keep quantity, shared by the cluster gate
    * ([[semDedupMembers]]) and the pairwise YAML processor.
    */
  private[graft] def centroidCosCol(k: Int): Column = {
    val cnorm = ivfCentroidNorms(k)
    val cents = ivfCentroids(k)
    (0 until k).foldLeft(when(lit(false), lit(0.0))) {
      (w, c) =>
        w.when(col("cell") === c,
          call_function("graft_dot", col("v"), typedlit(cents(c).toSeq)) /
            (col("nrm") * lit(cnorm(c))))
    }.otherwise(lit(Double.NaN))
  }

  /** Gate-fixture convenience: [[centroidCosCol]] at the K = 4 floor
    * (the quantizer every SQL oracle rebuilds). Declarative spellings
    * are O(K) expression nodes — fine at gate/probe K; the JVM pair
    * engines carry the same quantity at any K.
    */
  private[graft] def centroidCosCol: Column = centroidCosCol(IvfMinCells)


  /** The cell-shuffle pair engine behind [[dedupEmbedding]], over any
    * `(vec_id, v, nrm)` corpus — factored out so the scale probe
    * ([[ScaleProbe]]) can drive it with multiplied corpora.
    *
    * `withCentroidCos = true` additionally emits each member's cosine to
    * its OWN cell centroid (`ci`, `cj`) — the SemDeDup keep quantity —
    * computed inside the verify loop with the IDENTICAL operation
    * sequence as [[centroidCosCol]] (strict left-to-right dot, division
    * by nrm × the shared [[ivfCentroidNorms]] constant), so the values
    * are bit-equal to the SQL spelling. This lets the `sem_dedup`
    * processor decide pair losers from ONE pair-engine execution —
    * without it, any lazy DAG that re-joins pairs back to a cos_c
    * annotation re-executes the O(n²/K) verify reduce per reference
    * (self-review r12: the first cut re-executed it 5×).
    */
  private[graft] def embeddingPairs(corpus: DataFrame, thr: Double,
                                    sameCellOnly: Boolean = false,
                                    withCentroidCos: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val kCells = ivfCellsFor(corpus)
    val cents = spark.sparkContext.broadcast(ivfCentroids(kCells))
    val wantCc = withCentroidCos
    val dot = dotLR
    val n = corpus.select($"vec_id", $"v", $"nrm")
      .toDF("_1", "_2", "_3").as[(Long, Array[Double], Double)]
    // Cell assignment + replication to each cell pair (lo ≤ hi) that
    // contains the vector's cell: pair (a, b) with cells (ca, cb) meets
    // exactly once, in group key (min(ca,cb), max(ca,cb)). Approximate
    // mode emits each vector ONCE, under its own diagonal key — the
    // downstream group logic is unchanged (a diagonal group verifies
    // same-cell pairs), only cross-cell candidates disappear.
    val keyed = n.mapPartitions { it =>
      val cs = cents.value
      val k = cs.length
      it.flatMap { case (id, v, nrm) =>
        var best = 0
        var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          val acc = dot(v, cs(c))
          if (acc > bestDot) { bestDot = acc; best = c }
          c += 1
        }
        if (sameCellOnly)
          Iterator.single((best * k + best, (id, best, v, nrm)))
        else (0 until k).iterator.map { other =>
          val lo = math.min(best, other)
          val hi = math.max(best, other)
          (lo * k + hi, (id, best, v, nrm))
        }
      }
    }
    // ONE verify-loop spelling for both output shapes, as a captured
    // function VALUE (serialized by value into the task closures; a
    // module method reference would drag the enclosing object into
    // task serialization). emit receives group-array INDICES so the
    // centroid-cos path can index its per-member ccArr.
    // each pair verifies in ONE group: same-cell pairs on the diagonal
    // key, cross-cell pairs on their (lo, hi) key.
    val verify: (Array[(Long, Int, Array[Double], Double)], Boolean,
                 (Int, Int, Double) => Unit) => Unit = (arr, diag, emit) => {
      var i = 0
      while (i < arr.length) {
        val (_, ca, va, na) = arr(i)
        var j = i + 1
        while (j < arr.length) {
          val (_, cb, vb, nb) = arr(j)
          if (if (diag) ca == cb else ca != cb) {
            val cos = dot(va, vb) / (na * nb)
            if (cos >= thr) emit(i, j, cos)
          }
          j += 1
        }
        i += 1
      }
    }
    // two encoder shapes, not one widened-and-dropped tuple: the
    // default path is the O(n²/K) hot core under every gate, cached
    // pair frame, and scale probe — it must not pay per-pair widening
    // and serialization of two dead doubles (self-review r12 pass 4)
    if (!wantCc)
      keyed.groupByKey(_._1).flatMapGroups { (key, rows) =>
        val k = cents.value.length
        val diag = key / k == key % k
        val arr = rows.map(_._2).toArray.sortBy(_._1)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Double)]
        verify(arr, diag,
          (i, j, cos) => out += ((arr(i)._1, arr(j)._1, cos)))
        out.iterator
      }.toDF("i", "j", "cos_sim")
    else {
      // per-member centroid cos is computed ONCE per group member (a
      // member can appear in many pairs); the norms constant is the
      // shared driver-side [[ivfCentroidNorms]], captured as a local
      // val (serialized by value — no object dragging, no per-group
      // recompute; self-review r13 pass 1)
      val cnorms = ivfCentroidNorms(kCells)
      keyed.groupByKey(_._1).flatMapGroups { (key, rows) =>
        val cs = cents.value
        val k = cs.length
        val diag = key / k == key % k
        val arr = rows.map(_._2).toArray.sortBy(_._1)
        val ccArr: Array[Double] = arr.map { case (_, c, v, nrm) =>
          dot(v, cs(c)) / (nrm * cnorms(c))
        }
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Double, Double, Double)]
        verify(arr, diag,
          (i, j, cos) =>
            out += ((arr(i)._1, arr(j)._1, cos, ccArr(i), ccArr(j))))
        out.iterator
      }.toDF("i", "j", "cos_sim", "ci", "cj")
    }
  }

  /** The DIRECTED multi-probe candidate engine behind `nprobe >= 2`
    * annotate/dedup ([[Similarity.annTopKWithin]], the YAML `ann_topk`
    * and `sem_dedup` processors — VERDICT r12 #1): each vector is a
    * CANDIDATE in its own (argmax) cell and a QUERY in its top-`nprobe`
    * cells by centroid dot (dot DESC, cell ASC — the identical probe
    * order, dots included, as [[Similarity.annIvfMultiProbe]]'s
    * declarative spelling, so candidate sets are bit-identical to the
    * gate). ONE `groupByKey.flatMapGroups` keyed on the cell id: a group
    * holds the cell's residents plus its incoming probes; the tight
    * verify loop computes each group-local pair's cosine ONCE
    * (left-to-right — the [[embeddingPairs]] IEEE sequence) and emits
    * the directed edge (q_id, n_id, cos_sim ≥ thr) for each side that
    * is a RESIDENT of the group's cell. A vector resides in exactly one
    * cell, so every directed edge materializes exactly once; two
    * query-only members sharing a foreign probe cell skip the dot
    * entirely.
    *
    * `nprobe = 1` degenerates to the SYMMETRIZED same-cell pair set of
    * [[embeddingPairs]](sameCellOnly) with bit-identical cosines
    * (law-tested); callers keep routing 1 through that engine so the
    * default path's plan shape (and its pinned-once caching) is
    * untouched.
    *
    * `withCentroidCos = true` appends each endpoint's cosine to its OWN
    * cell centroid (`cq`, `cn`) — the SemDeDup keep quantity, the same
    * per-member recompute as [[embeddingPairs]]' withCentroidCos branch
    * (identical doubles), computed once per group member.
    *
    * Scale shape: shuffle volume is nprobe × corpus (each vector ships
    * to nprobe cells); group width is cell occupancy × nprobe ≈
    * n·nprobe/K, so executor memory stays cell-bounded and the pairwise
    * work is O(nprobe·n²/K) spread over K groups — the standard
    * multi-probe cost, never the n² brute force. No driver
    * materialization anywhere.
    */
  /** Probe-order comparator for [[embeddingProbeEdges]]: cell `a`
    * before cell `b` under (dot DESC, cell ASC) with SQL DOUBLE
    * semantics — NaN above every value, `-0.0 == 0.0`. Scala's
    * `sortBy(c => (-dots(c), c))` total ordering differs on both
    * (`-0.0 < 0.0`, NaN displaced by negation), so a corpus with an
    * exact ±0.0 centroid-dot tie could assign `ownCell` differently
    * from [[withIvfCell]]'s `>=`-chain argmax (advisor r13). Strict
    * weak order: the NaN branch keeps transitivity, the IEEE `!=`
    * branch makes ±0.0 a tie broken by cell index — exactly the
    * declarative spelling's rank.
    */
  private[graft] def probeBefore(dots: Array[Double])(a: Int, b: Int): Boolean = {
    val (da, db) = (dots(a), dots(b))
    val aNaN = java.lang.Double.isNaN(da)
    val bNaN = java.lang.Double.isNaN(db)
    if (aNaN != bNaN) aNaN               // SQL: NaN sorts above all
    else if (!aNaN && da != db) da > db  // IEEE !=: -0.0 ties 0.0
    else a < b                           // dot tie -> cell ASC
  }

  private[graft] def embeddingProbeEdges(corpus: DataFrame, thr: Double,
                                         nprobe: Int,
                                         withCentroidCos: Boolean = false): DataFrame = {
    val kCells = ivfCellsFor(corpus)
    require(nprobe >= 1,
      s"nprobe must be >= 1, got $nprobe")
    // cap at the RESOLVED cell count — since K became corpus-scaled
    // (VERDICT r16 #1) this check can only live where the corpus is
    // known, not at YAML parse time; a breadth beyond K would silently
    // behave as exhaustive, hiding a config mistake
    require(nprobe <= kCells,
      s"nprobe must be <= $kCells (the quantizer's cell count; that " +
      s"breadth is already exhaustive), got $nprobe")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = spark.sparkContext.broadcast(ivfCentroids(kCells))
    val np = nprobe
    val dot = dotLR
    val n = corpus.select($"vec_id", $"v", $"nrm")
      .toDF("_1", "_2", "_3").as[(Long, Array[Double], Double)]
    // (groupCell, (id, ownCell, v, nrm)): one copy per probed cell; a
    // member is a RESIDENT (candidate) of the group iff ownCell == key.
    // ownCell is probe rank 1 — the argmax with lowest-cell ties, the
    // same total order (dot DESC, cell ASC) as withIvfCell's >= chains.
    // The order must use SQL double semantics (NaN greatest, -0.0 ==
    // 0.0), NOT Scala's TotalOrdering via sortBy on negated doubles
    // (-0.0 < 0.0 there): a corpus with an exact ±0.0 centroid-dot tie
    // would otherwise assign ownCell differently from the declarative
    // quantizer and break the asserted bit-identity (advisor r13 —
    // unreachable with the md5 fixture centroids, but load-bearing).
    val keyed = n.mapPartitions { it =>
      val cs = cents.value
      val k = cs.length
      it.flatMap { case (id, v, nrm) =>
        val dots = Array.tabulate(k)(c => dot(v, cs(c)))
        val order = (0 until k).sortWith(probeBefore(dots))
        val own = order.head
        order.iterator.take(np).map(g => (g, (id, own, v, nrm)))
      }
    }
    // shared pair loop: cos computed once per group-local pair (the
    // [[dotLR]] fold — the bit-identity spelling); emit receives array
    // indices + the cosine, and the caller adds one directed edge per
    // resident endpoint
    val pairLoop: (Array[(Long, Int, Array[Double], Double)], Int,
                   (Int, Int, Double) => Unit) => Unit = (arr, key, emit) => {
      var i = 0
      while (i < arr.length) {
        val (_, ci_, vi, ni) = arr(i)
        var j = i + 1
        while (j < arr.length) {
          val (_, cj_, vj, nj) = arr(j)
          if (ci_ == key || cj_ == key) { // at least one resident
            val cos = dot(vi, vj) / (ni * nj)
            if (cos >= thr) emit(i, j, cos)
          }
          j += 1
        }
        i += 1
      }
    }
    if (!withCentroidCos)
      keyed.groupByKey(_._1).flatMapGroups { (key, rows) =>
        val arr = rows.map(_._2).toArray.sortBy(_._1)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Double)]
        pairLoop(arr, key, (i, j, cos) => {
          if (arr(j)._2 == key) out += ((arr(i)._1, arr(j)._1, cos))
          if (arr(i)._2 == key) out += ((arr(j)._1, arr(i)._1, cos))
        })
        out.iterator
      }.toDF("q_id", "n_id", "cos_sim")
    else {
      // per-member OWN-cell centroid cos (not the group's cell): the
      // keep policy compares each member to its own quantizer cell,
      // and a probing member's own cell differs from the group key;
      // norms are the shared driver-side [[ivfCentroidNorms]] local
      val cnorms = ivfCentroidNorms(kCells)
      keyed.groupByKey(_._1).flatMapGroups { (key, rows) =>
        val cs = cents.value
        val arr = rows.map(_._2).toArray.sortBy(_._1)
        val ccArr: Array[Double] = arr.map { case (_, c, v, nrm) =>
          dot(v, cs(c)) / (nrm * cnorms(c))
        }
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Double, Double, Double)]
        pairLoop(arr, key, (i, j, cos) => {
          if (arr(j)._2 == key)
            out += ((arr(i)._1, arr(j)._1, cos, ccArr(i), ccArr(j)))
          if (arr(i)._2 == key)
            out += ((arr(j)._1, arr(i)._1, cos, ccArr(j), ccArr(i)))
        })
        out.iterator
      }.toDF("q_id", "n_id", "cos_sim", "cq", "cn")
    }
  }

  /** The IVF coarse quantizer as a GATED query: per-cell histogram of the
    * corpus under the [[ivfCentroids]] assignment (argmax dot, lowest
    * cell on ties). The oracle REBUILDS the centroids from the md5
    * formula in SQL and must land every vector in the same cell — the
    * cross-engine proof that the quantizer feeding [[dedupEmbedding]]
    * (and any IVF-bucketed ANN) is deterministic, not an engine artifact.
    *
    * This declarative twin uses the registered `graft_dot` expression
    * with the centroid as a typed literal — the same strict
    * left-to-right fold as DuckDB's `list_reduce`, so the dot products
    * (and hence the argmax) are bit-identical.
    */
  /** Declarative IVF cell assignment: adds a `cell` column (argmax dot
    * against [[ivfCentroids]], lowest cell on ties) via the registered
    * `graft_dot` expression with the centroids as typed literals — the
    * same strict left-to-right fold as DuckDB's `list_reduce`, so the
    * dots (and hence the argmax) are bit-identical cross-engine. Shared
    * by [[ivfCellHistogram]] and [[Similarity.annIvf]].
    */
  /** The raw centroid dots (`_ivf_d0.._ivf_dN`) behind [[withIvfCell]] —
    * also the input to multi-probe search ([[Similarity.annIvfMultiProbe]]),
    * which needs the top-P cells per query, not just the argmax.
    *
    * `k` is the RESOLVED cell count, threaded from the operation's top
    * level ([[ivfCellsFor]] on the FULL corpus) so a query-subset frame
    * gets the same quantizer as the corpus side. These declarative
    * spellings are O(K) columns and an O(K²)-comparison argmax chain —
    * the SQL-oracled gate/probe shapes (K = 4 floor at fixture SFs);
    * the corpus-scale paths are the JVM engines ([[embeddingPairs]],
    * [[embeddingProbeEdges]]), whose assignment is an O(K·dim) loop.
    */
  private[llm] def withIvfDots(df: DataFrame, k: Int): DataFrame = {
    val cents = ivfCentroids(k)
    (0 until k).foldLeft(df) { (d, c) =>
      d.withColumn(s"_ivf_d$c",
        call_function("graft_dot", col("v"), typedlit(cents(c).toSeq)))
    }
  }

  private[graft] def withIvfCell(df: DataFrame, k: Int): DataFrame = {
    val withDots = withIvfDots(df, k)
    // argmax with >= chains = lowest cell index wins ties, same CASE
    // shape as the oracle
    val cell = (0 until k - 1).foldLeft(when(lit(false), -1)) { (w, c) =>
      val beatsRest = (c + 1 until k)
        .map(o => col(s"_ivf_d$c") >= col(s"_ivf_d$o")).reduce(_ && _)
      w.when(beatsRest, c)
    }.otherwise(k - 1)
    withDots.withColumn("cell", cell.cast("int"))
      .drop((0 until k).map(c => s"_ivf_d$c"): _*)
  }

  /** Convenience overload resolving K from `df` itself — for FULL
    * corpus frames only (a sub-filtered frame would resolve its own,
    * smaller K and disagree with the corpus side's quantizer).
    */
  private[graft] def withIvfCell(df: DataFrame): DataFrame =
    withIvfCell(df, ivfCellsFor(df))

  def ivfCellHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val corpus = Similarity.corpus(spark, dir)
    withIvfCell(corpus, ivfCellsFor(corpus))
      .groupBy($"cell")
      .agg(count(lit(1)).as("n_vecs"),
           min($"vec_id").as("first_vec"), max($"vec_id").as("last_vec"))
      .orderBy($"cell")
  }

  /** Segment (paragraph-level) width in words for [[paraDedup]]. The
    * fixture text has no newline paragraph marks, so fixed 10-word
    * segments stand in for paragraphs; on a real corpus the split would
    * be on blank lines and everything downstream is unchanged.
    */
  private val SegWords = 10

  /** Sub-document exact dedup — the corpus-level "remove repeated
    * paragraphs" pass (RefinedWeb/C4-style): split every document into
    * segments, keep only each distinct segment's FIRST occurrence
    * (ordered by doc_id then position — deterministic), and reassemble
    * the surviving segments per document.
    *
    * Scale notes: one explode (rows × segments-per-doc, bounded by
    * document length), one window partitioned BY SEGMENT VALUE (the
    * dedup shuffle — equivalent to a groupBy on the segment, never
    * all-pairs), one groupBy(doc_id) to reassemble. At 100 TB the
    * segment-hash shuffle is the same shape as exact document dedup;
    * skew on a viral paragraph is bounded because the window computes
    * only row_number (a streaming rank, no buffering beyond the sort).
    * The reassembled text is emitted as md5 — the gate needs equality
    * evidence, not a second copy of the corpus.
    */
  def paraDedup(spark: SparkSession, dir: String): DataFrame =
    paraDedupFrom(Tables.documents(spark, dir))

  /** [[paraDedup]] over any (doc_id, text) corpus — also the entry point
    * [[ScaleProbe]] drives at multiplied corpus sizes.
    */
  def paraDedupFrom(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val segs = docs
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", explode(expr(
        s"""transform(
           |  sequence(0, cast(ceil(size(ws) / $SegWords.0) as int) - 1),
           |  i -> struct(
           |    cast(i as bigint) as seg_i,
           |    array_join(slice(ws, i * $SegWords + 1, $SegWords), ' ') as seg))
           |""".stripMargin)).as("s"))
      .select($"doc_id", $"s.seg_i", $"s.seg")
    val firstOcc = org.apache.spark.sql.expressions.Window
      .partitionBy($"seg").orderBy($"doc_id", $"seg_i")
    segs.withColumn("keep", row_number().over(firstOcc) === 1)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_seg"),
           sum($"keep".cast("long")).as("n_kept"),
           md5(array_join(
             transform(
               array_sort(collect_list(when($"keep", struct($"seg_i", $"seg")))),
               x => x.getField("seg")),
             " ")).as("clean_md5"))
      .orderBy($"doc_id")
  }

  /** End-to-end dedup survivor selection — the step that turns a cluster
    * map into an actual keep/drop decision. Policy: keep the LONGEST
    * member of each near-dup cluster (most content survives), ties to
    * the lowest doc_id. Composes [[dedupClusters]] with the documents
    * dim: one join + one max_by aggregate on the cluster key — the
    * cluster map is tiny relative to the corpus, so at scale this costs
    * one keyed shuffle of the clustered subset, nothing corpus-wide.
    */
  def dedupSurvivors(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val clusters = dedupClusters(spark, dir)
    // broadcast the CLUSTER side explicitly: it is tiny (near-dup docs
    // only) but arrives as a checkpointed RDD with no stats, so Catalyst
    // otherwise broadcasts the documents scan — the whole corpus at
    // scale (same class as the semDedup label join, pinned by PlanSpec)
    broadcast(clusters)
      .join(Tables.documents(spark, dir).select($"doc_id", $"n_chars"),
            Seq("doc_id"))
      .groupBy($"cluster_rep")
      .agg(count(lit(1)).as("n_members"),
           expr("max_by(doc_id, struct(n_chars, -doc_id))").as("survivor_doc_id"),
           max($"n_chars").as("survivor_chars"))
      .where($"n_members" > 1)
      .orderBy($"cluster_rep")
  }

  /** Character k-gram width for [[substringSpans]]. 24 chars on this
    * fixture (31-word vocabulary, ~300-char docs) separates genuinely
    * copied passages from single shared words: 298/500 docs carry a
    * duplicated span, 105 of them more than one — so the span-merge
    * window is actually exercised by the gate, not just the unit test.
    * Real pipelines use ~50 BPE tokens (Lee et al. 2022); the width is
    * the only fixture-shaped constant here.
    */
  private val SpanGram = 24

  /** Duplicated-SUBSTRING span detection — the span-level twin of
    * document/paragraph dedup ("Deduplicating Training Data Makes
    * Language Models Better", Lee et al. 2022: most duplication in web
    * corpora is long repeated passages INSIDE otherwise-distinct
    * documents, which doc-level MinHash cannot remove). A position is
    * duplicated when its k-char gram occurs in ≥ 2 distinct documents;
    * runs of duplicated positions merge into maximal spans (fixed gram
    * width ⇒ two hits merge iff their starts are ≤ k apart), and the
    * per-document report carries span count, duplicated chars, and an
    * integer-ppm duplication ratio — the numbers a curation pipeline
    * cuts on before excising the spans.
    *
    * Scale notes: one explode (a row per char position — the same cost
    * class as [[TextStats.winnowMins]], which this corpus already pays
    * for fingerprinting), one gram-keyed aggregate for the cross-doc
    * document-frequency test (map-side partial `countDistinct` via the
    * partial-aggregation pushdown, one shuffle), one semi-join back on
    * the gram, then one per-doc window (lag + running sum — streaming
    * rank, no buffering) and one aggregate. Never all-pairs, never a
    * driver collect; the gram-keyed shuffle is the standard suffix-
    * array-free approximation of the Lee et al. suffix automaton, exact
    * for duplications ≥ k chars. Grouping is on the RAW 24-char gram
    * (not a hash): bit-identical in DuckDB, and at 100 TB the gram key
    * would swap for [[CrossHash]]'s 60-bit digest with the identical
    * plan shape.
    */
  def substringSpans(spark: SparkSession, dir: String): DataFrame =
    spansReport(dupSpansForDir(spark, dir))

  /** The maximal-span frame memoized per (session, fixture dir) — the
    * [[SuffixIndex.forDir]] pattern (r11): the spans gate and the
    * excision gate consume the SAME span frame over the same corpus,
    * and deriving it (position explode + gram window + span merge) is
    * the dominant cost of both. Retained pin so Bench's debris sweep
    * spares it between the two gates; the from-frame twins below stay
    * un-memoized for laws/probes.
    */
  private val spanCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  graft.state.Materialize.registerSessionCache(() => spanCache.clear())

  /** Wall seconds of the largest memoized span-frame build this JVM
    * (−1 until one runs) — emitted into BENCH.json's env block so the
    * one-time cold cost the medians exclude stays machine-readable
    * (the `suffix_index_cold_s` accounting convention).
    */
  private val spanFrameColdGauge = new graft.state.MaxGauge
  def spanFrameColdSeconds: Double = spanFrameColdGauge.get

  private def dupSpansForDir(spark: SparkSession, dir: String): DataFrame = {
    graft.state.Materialize.purgeStopped(spanCache)(_._1)
    spanCache.computeIfAbsent((spark, dir), _ => {
      val t0 = System.nanoTime()
      val sp = graft.state.Materialize.pinRetained(dupSpans(
        Tables.documents(spark, dir).select(col("doc_id"), col("text"))))
      spanFrameColdGauge.sample((System.nanoTime() - t0) / 1e9)
      sp
    })
  }

  /** The shared span core: per-doc maximal duplicated spans
    * `(doc_id, len, span_id, s, e)` — feeds the per-doc report
    * ([[substringSpansFrom]]) and the excision step
    * ([[substringExciseFrom]]).
    */
  private def dupSpans(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val k = SpanGram
    val pos = docs.filter(length($"text") >= k)
      .select($"doc_id", length($"text").cast("long").as("len"),
        explode(expr(s"sequence(0, length(text) - $k)")).as("i"),
        $"text")
      .select($"doc_id", $"len", $"i".cast("long").as("i"),
        expr(s"substring(text, i + 1, $k)").as("g"))
    // cross-doc duplication test WITHOUT a join: a gram occurs in ≥ 2
    // distinct docs iff min(doc_id) ≠ max(doc_id) over its partition —
    // one window shuffle on the gram, instead of a countDistinct
    // aggregate PLUS a join back that re-derives the whole position
    // explode a second time (measured 9.2s → ~3s at sf0.1)
    val byGram = org.apache.spark.sql.expressions.Window.partitionBy($"g")
    val hit = pos
      .withColumn("d_min", min($"doc_id").over(byGram))
      .withColumn("d_max", max($"doc_id").over(byGram))
      .where($"d_min" =!= $"d_max")
      .select($"doc_id", $"len", $"i")
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"i")
    hit
      // new span iff the gap to the previous hit exceeds the gram width
      // (equal-length grams ⇒ running-max-end is just lag(i) + k)
      .withColumn("brk",
        when(coalesce($"i" - lag($"i", 1).over(byPos), lit(k.toLong + 1)) > k,
          1L).otherwise(0L))
      .withColumn("span_id", sum($"brk").over(
        byPos.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"doc_id", $"len", $"span_id")
      .agg(min($"i").as("s"), (max($"i") + k).as("e"))
  }

  /** [[substringSpans]] over any (doc_id, text) corpus — also the
    * [[ScaleProbe]] entry.
    */
  def substringSpansFrom(docs: DataFrame): DataFrame =
    spansReport(dupSpans(docs))

  private def spansReport(sp: DataFrame): DataFrame = {
    import sp.sparkSession.implicits._
    sp.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"),
           sum($"e" - $"s").as("chars_dup"),
           max($"len").as("len"),
           min($"s").as("first_s"),
           max($"e").as("last_e"))
      .select($"doc_id", $"n_spans", $"chars_dup",
        expr("(1000000 * chars_dup) div len").as("dup_ppm"),
        $"first_s", $"last_e")
      .orderBy($"doc_id")
  }

  /** Span EXCISION — the actionable half of [[substringSpans]]: cut
    * every duplicated span out of every document and reassemble the
    * survivors (the C4/Lee-et-al. cleanup step; the aggressive
    * remove-everywhere policy is deterministic and
    * partitioning-independent, unlike keep-first-occurrence which
    * depends on a global document order). Kept intervals derive from
    * the span list alone: `[prev_span_end, span_start)` per span via
    * one lag window, plus the `[last_span_end, len)` tail per doc —
    * then one join back to the corpus slices the text and one ordered
    * aggregate reassembles it. Reported as md5 + lengths (the gate
    * needs equality evidence, not a second copy of the corpus — same
    * discipline as [[paraDedup]]).
    *
    * Scale notes: inherits [[dupSpans]]'s two shuffles; the excision
    * itself adds one small join (spans ⋈ docs — span-bearing docs
    * only, broadcast-able in practice) and one per-doc aggregate. The
    * reassembly buffers only a doc's own kept segments.
    */
  def substringExcise(spark: SparkSession, dir: String): DataFrame =
    exciseFromSpans(dupSpansForDir(spark, dir),
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** [[substringExcise]] over any (doc_id, text) corpus. */
  def substringExciseFrom(docs: DataFrame): DataFrame =
    // the span frame is consumed THREE times below (kept-interval lag,
    // per-doc tail, cut-count aggregate); materialize it once or each
    // consumer re-derives the position explode + both window shuffles
    // (the winnowPairs lesson, measured 4.1s → ~3s at sf0.1) — the
    // frame is tiny (span rows only), so the checkpoint is cheap. The
    // dir-keyed gates share the memoized frame instead (dupSpansForDir).
    exciseFromSpans(dupSpans(docs).transform(graft.state.Materialize.pin),
      docs)

  // callers decide how `sp` is materialized (memoized retained pin for
  // the dir-keyed gates, plain pin for the from-frame twin)
  private def exciseFromSpans(sp: DataFrame, docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val bySpan = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"s")
    // kept interval BEFORE each span (empty when spans are back-to-back
    // with the doc edge: ks == ke filtered below) …
    val mid = sp
      .withColumn("ks", coalesce(lag($"e", 1).over(bySpan), lit(0L)))
      .select($"doc_id", $"ks", $"s".as("ke"))
    // … plus the tail interval after the last span
    val tail = sp.groupBy($"doc_id")
      .agg(max($"e").as("ks"), max($"len").as("ke"))
      .select($"doc_id", $"ks", $"ke")
    val kept = mid.unionByName(tail).where($"ks" < $"ke")
    // the text-slice join must NOT broadcast either side: the corpus is
    // the corpus, and the kept intervals are corpus-proportional in the
    // worst case — without the hint Catalyst broadcasts the documents
    // FileScan (small at test SF, the whole corpus at 100 TB). A
    // shuffled hash join on doc_id builds per-partition tables from the
    // kept side only.
    val segs = kept.hint("SHUFFLE_HASH").join(docs, Seq("doc_id"))
      .select($"doc_id", $"ks", ($"ke" - $"ks").as("n"),
        expr("substring(text, cast(ks + 1 as int), cast(ke - ks as int))")
          .as("seg"))
    val recon = segs.groupBy($"doc_id")
      .agg(sum($"n").as("clean_len"),
           md5(array_join(
             transform(array_sort(collect_list(struct($"ks", $"seg"))),
               x => x.getField("seg")),
             "")).as("clean_md5"))
    // left join: a doc whose spans cover ALL of it has no kept segments
    // — it must still be reported, as fully excised (md5 of "")
    sp.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_cut"), sum($"e" - $"s").as("chars_cut"))
      .join(recon, Seq("doc_id"), "left")
      .select($"doc_id", $"n_cut", $"chars_cut",
        coalesce($"clean_len", lit(0L)).as("clean_len"),
        coalesce($"clean_md5", md5(lit(""))).as("clean_md5"))
      .orderBy($"doc_id")
  }

  /** Character-level verification of the near-dup candidates: exact
    * Levenshtein distance + integer-ppm similarity over the MinHash
    * pair set — the second, orthogonal metric a dedup pipeline uses to
    * adjudicate borderline pairs (token-set Jaccard is blind to
    * within-token edits and ordering; edit distance is not). Quadratic
    * DP per pair is affordable precisely BECAUSE it runs on the LSH
    * candidates (|pairs|, bounded by banding) and never corpus-wide —
    * the same candidates-only economics as the exact-Jaccard verify.
    */
  def dedupEditDist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"text")
    nearDupPairs(spark, dir).select($"d1", $"d2")
      .join(docs.select($"doc_id".as("d1"), $"text".as("t1")), Seq("d1"))
      .join(docs.select($"doc_id".as("d2"), $"text".as("t2")), Seq("d2"))
      .withColumn("dist", levenshtein($"t1", $"t2").cast("long"))
      .withColumn("maxlen", greatest(length($"t1"), length($"t2")).cast("long"))
      .select($"d1", $"d2", $"dist",
        expr("(1000000 * (maxlen - dist)) div maxlen").as("sim_ppm"))
      .orderBy($"d1", $"d2")
  }

  /** Content-defined chunking (CDC) dedup — the rolling-hash boundary
    * technique storage systems and large-scale corpus pipelines use for
    * shift-tolerant duplicate detection (reference intent: the dedup
    * family of kafka_pipelines/processors; no reference analog — this is
    * the beyond-spec scale path). Fixed-width chunking (llm_chunking,
    * llm_para_dedup) breaks on a 1-char insertion — every later chunk
    * boundary shifts and nothing matches; CDC instead cuts wherever the
    * hash of the trailing `w`-char window ≡ 0 (mod `divisor`), so
    * boundaries are a pure function of LOCAL content and re-synchronize
    * immediately after any edit. Expected chunk length = `divisor` chars.
    *
    * Per doc: explode char positions (the [[TextStats.winnowMins]] cost
    * shape: one hash per position, map-side), keep boundary positions,
    * assemble cut points `[0] ++ cuts ++ [len]`, slice chunks, md5 each.
    * A chunk is duplicated when its hash occurs in ≥ 2 distinct docs —
    * one content-hash-keyed aggregate + join-back, both shuffles on the
    * uniform md5 key, so no skew at any corpus size (the same economics
    * as [[dedupExact]], at sub-document granularity). Shift-tolerance at
    * sub-chunk scale is [[substringSpans]]' job; CDC is the cheap
    * corpus-wide screen that feeds such detectors.
    */
  /** The CDC chunker as a PURE per-row projection: boundary positions via
    * `filter` over the position sequence, cut points and chunk slices via
    * `transform` — one codegen'd expression, NO shuffle and NO per-doc
    * aggregation. That shape is what makes the chunker legal in a
    * streaming select ([[graft.streaming.ChunkDedupStream]]): streaming
    * forbids the window/groupBy the batch form uses. For BATCH the
    * explode pipeline ([[cdcChunkRowsBatch]]) is ~25% faster (the
    * higher-order form allocates a len-sized position array per row;
    * explode streams positions through codegen) — CdcChunksSpec pins the
    * two chunkers row-identical so the boundary rule cannot drift.
    * Returns (doc_id, j, chunk, h).
    */
  private[graft] def cdcChunkRows(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val w = 16       // boundary window (bytes)
    val divisor = 64 // boundary density ⇒ expected chunk length (bytes)
    // BYTE semantics (declared round 10): boundary positions, window
    // hashes and cut arithmetic are over the UTF-8 byte stream — the
    // contract `graft_md5_60_at` natively implements. Chunk IDENTITY
    // (`h`) is md5 of the raw byte slice, so dedup is exact even when a
    // boundary splits a multi-byte character; `chunk` is the bytes
    // reinterpreted as a string (cast, not decode — byte-preserving and
    // total; identical to the old char spelling on ASCII), `nb` the
    // exact byte width.
    docs
      .select($"doc_id", $"text", octet_length($"text").as("len"),
        encode($"text", "UTF-8").as("tb"))
      // boundary at i ⇔ hash(window ending at i) ≡ 0 (mod divisor);
      // i ≤ len−1 — a cut at the end would emit an empty chunk. The CASE
      // guards sequence()'s descending mode (len = 16 ⇒ sequence(16, 15)
      // would count DOWN, not produce empty).
      .withColumn("cuts2", expr(
        s"""concat(array(0),
           |  CASE WHEN len > $w THEN
           |    filter(sequence($w, len - 1), i ->
           |      graft_md5_60_at(text, i - ${w - 1} - 1, $w)
           |        % $divisor = 0)
           |  ELSE array() END,
           |  array(len))""".stripMargin))
      .select($"doc_id", explode(expr(
        """transform(sequence(1, size(cuts2) - 1), j -> struct(
          |  j AS j,
          |  substring(tb, element_at(cuts2, j) + 1,
          |            element_at(cuts2, j + 1) - element_at(cuts2, j)) AS cb,
          |  element_at(cuts2, j + 1) - element_at(cuts2, j) AS nb))"""
          .stripMargin)).as("c"))
      // chunk display = cast(binary → string): byte-preserving reinterpret,
      // total where Spark 4's `decode` throws on a mid-character cut
      .select($"doc_id", $"c.j".as("j"), $"c.cb".cast("string").as("chunk"),
        $"c.nb".as("nb"), md5($"c.cb").as("h"))
  }

  /** [[cdcChunkRows]]'s batch twin: identical chunks via explode +
    * boundary-only groupBy + join — the shuffle of boundary rows is tiny
    * (one row per cut) and the position stream never materializes as a
    * per-row array.
    */
  private[graft] def cdcChunkRowsBatch(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val w = 16
    val divisor = 64
    // byte semantics — see [[cdcChunkRows]] (CdcChunksSpec pins the
    // twins row-identical so the boundary rule cannot drift)
    val d = docs.select($"doc_id", $"text", octet_length($"text").as("len"),
      encode($"text", "UTF-8").as("tb"))
    val bounds = d
      .filter($"len" >= w)
      .select($"doc_id", $"len", $"text",
        explode(expr(s"sequence($w, len)")).as("i"))
      .filter($"i" < $"len") // a cut at the end would emit an empty chunk
      .select($"doc_id", $"i",
        expr(s"graft_md5_60_at(text, i - ${w - 1} - 1, $w)").as("hv"))
      .filter($"hv" % divisor === 0)
      .groupBy($"doc_id").agg(sort_array(collect_list($"i")).as("cuts"))
    d.join(bounds, Seq("doc_id"), "left")
      .withColumn("cuts2", concat(
        array(lit(0)),
        coalesce($"cuts", expr("cast(array() as array<int>)")),
        array($"len")))
      .select($"doc_id", $"tb", $"cuts2",
        explode(expr("sequence(1, size(cuts2) - 1)")).as("j"))
      .select($"doc_id", $"j",
        expr("substring(tb, element_at(cuts2, j) + 1, " +
             "element_at(cuts2, j + 1) - element_at(cuts2, j))").as("cb"),
        expr("element_at(cuts2, j + 1) - element_at(cuts2, j)").as("nb"))
      .select($"doc_id", $"j", $"cb".cast("string").as("chunk"),
        $"nb", md5($"cb").as("h"))
  }

  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Pinned (r17): the chunk frame feeds BOTH the dup census and the
    // join-back below — unpinned, the per-byte-position md5 explode (the
    // chunker's hot tower) ran twice per query. Call-site pin, not
    // inside cdcChunkRowsBatch: single-consumer callers (ScaleProbe,
    // the streaming twin's tests) would pay the barrier for nothing.
    val chunks = graft.state.Materialize.pin(cdcChunkRowsBatch(
      Tables.documents(spark, dir).select($"doc_id", $"text")))
    val dup = chunks.groupBy($"h").agg(countDistinct($"doc_id").as("nd"))
    chunks.join(dup, Seq("h"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when($"nd" >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
        // byte width from the cut arithmetic (== char width on the ASCII
        // fixture the oracle's len(chunk) runs on)
        sum(when($"nd" >= 2, $"nb").otherwise(0)).cast("long")
          .as("dup_chars"),
        md5(array_join(
          transform(array_sort(collect_list(struct($"j", $"h"))),
            x => x.getField("h")), "")).as("chunks_md5"))
      .orderBy($"doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_longest_dup_substring" -> (longestDupSubstring _),
    "llm_dedup_bloom_inc" -> (dedupBloomIncremental _),
    "llm_cdc_chunks"      -> (cdcChunks _),
    "llm_dedup_editdist"  -> (dedupEditDist _),
    "llm_dedup_survivors" -> (dedupSurvivors _),
    "llm_para_dedup"      -> (paraDedup _),
    "llm_dedup_exact"     -> (dedupExact _),
    "llm_dedup_incremental" -> (dedupIncremental _),
    "llm_url_dedup"       -> (urlDedup _),
    "llm_snapshot_diff"   -> (snapshotDiff _),
    "llm_dedup_minhash"   -> (dedupNearMinhash _),
    "llm_dedup_clusters"  -> (dedupClusters _),
    "llm_jaccard_ngram"   -> (jaccardNgram _),
    "llm_dedup_simhash"   -> (dedupSimhash _),
    "llm_dedup_embedding" -> (dedupEmbedding _),
    "llm_dedup_embedding_approx" -> (dedupEmbeddingApprox _),
    "llm_substring_spans" -> (substringSpans _),
    "llm_substring_excise" -> (substringExcise _),
    "llm_semdedup"        -> (semDedup _),
    "llm_ivf_cells"       -> (ivfCellHistogram _)
  )

  def oracle: Map[String, String] = Map(
    // INDEPENDENT method: the classical suffix-sort theorem — the longest
    // repeated substring's length is the max LCP over ADJACENT suffixes
    // of the full corpus suffix sort (the engine binary-searches lengths
    // with rolling-hash dup probes instead; agreeing answers prove both)
    "llm_longest_dup_substring" ->
      """WITH s AS (
        |  SELECT doc_id, i, substring(text, i + 1) AS suf
        |  FROM documents, unnest(range(0, len(text))) AS t(i)
        |  WHERE len(text) > 0),
        |o AS (SELECT suf, lag(suf) OVER (ORDER BY suf) AS prev FROM s),
        |l AS (
        |  -- list_position yields 0 (not NULL) when no mismatch exists —
        |  -- nullif routes the is-a-prefix/identical case to least(len)
        |  SELECT CASE WHEN prev IS NULL THEN 0 ELSE coalesce(
        |    nullif(list_position(list_transform(
        |      range(1, least(len(suf), len(prev)) + 1),
        |      k -> substr(suf, k, 1) = substr(prev, k, 1)), false), 0) - 1,
        |    least(len(suf), len(prev))) END AS lcp
        |  FROM o),
        |m AS (SELECT max(lcp)::BIGINT AS lmax FROM l),
        |g AS (
        |  SELECT doc_id, substr(text, i + 1, (SELECT lmax FROM m)) AS g
        |  FROM documents, unnest(range(0, len(text))) AS t(i)
        |  WHERE len(text) - i >= (SELECT lmax FROM m))
        |SELECT (SELECT lmax FROM m) AS lmax, g,
        |  COUNT(*)::BIGINT AS n_occ,
        |  COUNT(DISTINCT doc_id)::BIGINT AS n_docs
        |FROM g GROUP BY g HAVING COUNT(*) >= 2 ORDER BY g""".stripMargin,
    // byte-for-byte the same boundary rule: hex60(16-char window) % 64 = 0,
    // cut points [0]+cuts+[len], chunks as 1-based substr slices, chunk
    // identity by md5, dup = hash in >= 2 distinct docs
    "llm_cdc_chunks" ->
      s"""WITH d AS (SELECT doc_id, text, len(text)::BIGINT AS len FROM documents),
        |pos AS (SELECT doc_id, text, len, unnest(range(16, len + 1)) AS i
        |        FROM d WHERE len >= 16),
        |bnd AS (SELECT doc_id, i FROM pos
        |        WHERE i < len
        |          AND ${CrossHash.hex60Sql("substr(text, (i - 15)::INT, 16)")} % 64 = 0),
        |cuts AS (SELECT doc_id, list_sort(list(i)) AS cl FROM bnd GROUP BY doc_id),
        |cl2 AS (SELECT d.doc_id, d.text,
        |          list_append(list_prepend(0::BIGINT, COALESCE(cl, []::BIGINT[])),
        |                      d.len) AS cuts2
        |        FROM d LEFT JOIN cuts USING (doc_id)),
        |ch0 AS (SELECT doc_id, text, cuts2,
        |          unnest(range(1, len(cuts2))) AS j FROM cl2),
        |ch AS (SELECT doc_id, j,
        |         substr(text, (cuts2[j] + 1)::INT,
        |                (cuts2[j + 1] - cuts2[j])::INT) AS chunk
        |       FROM ch0),
        |hh AS (SELECT doc_id, j, chunk, md5(chunk) AS h FROM ch),
        |dup AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM hh GROUP BY h)
        |SELECT doc_id, COUNT(*)::BIGINT AS n_chunks,
        |  SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
        |  SUM(CASE WHEN nd >= 2 THEN len(chunk) ELSE 0 END)::BIGINT AS dup_chars,
        |  md5(string_agg(h, '' ORDER BY j)) AS chunks_md5
        |FROM hh JOIN dup USING (h)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the pair set replays as exact Jaccard (the minhash verify is
    // exact, so LSH banding only ever prunes TRUE negatives on this
    // fixture — same argument as the llm_dedup_minhash oracle), then
    // DuckDB's levenshtein adjudicates identically
    "llm_dedup_editdist" ->
      s"""WITH ${shingleCte(3)},
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
        |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |pairs AS (SELECT d1, d2
        |  FROM p JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |  WHERE 5 * inter >= 3 * (s1.n + s2.n - inter)),
        |e AS (SELECT d1, d2,
        |        levenshtein(a.text, b.text)::BIGINT AS dist,
        |        GREATEST(len(a.text), len(b.text))::BIGINT AS maxlen
        |      FROM pairs JOIN documents a ON d1 = a.doc_id
        |                 JOIN documents b ON d2 = b.doc_id)
        |SELECT d1, d2, dist,
        |  (1000000 * (maxlen - dist)) // maxlen AS sim_ppm
        |FROM e ORDER BY d1, d2""".stripMargin,
    // same fixed-width segmentation, first-occurrence ranking, and
    // ordered reassembly; COALESCE('') covers a document whose every
    // segment was seen earlier (string_agg over zero rows is NULL,
    // Spark's array_join over an empty array is '')
    "llm_para_dedup" ->
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |ex AS (SELECT doc_id, w,
        |         unnest(range(CAST(ceil(len(w) / $SegWords.0) AS BIGINT))) AS seg_i
        |       FROM ws),
        |segs AS (SELECT doc_id, seg_i,
        |           array_to_string(
        |             list_slice(w, seg_i * $SegWords + 1, seg_i * $SegWords + $SegWords),
        |             ' ') AS seg
        |         FROM ex),
        |rk AS (SELECT doc_id, seg_i, seg,
        |         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_i) AS rn
        |       FROM segs)
        |SELECT doc_id, COUNT(*) AS n_seg,
        |  COUNT(*) FILTER (WHERE rn = 1) AS n_kept,
        |  md5(COALESCE(
        |    string_agg(seg, ' ' ORDER BY seg_i) FILTER (WHERE rn = 1), '')) AS clean_md5
        |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "llm_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 100
        |)
        |SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
        |  md5(text) AS content_hash
        |FROM corpus GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    // the bloom prescreen is a pure COST rewrite (no false negatives ⇒
    // identical rows): the oracle is the plain anti-join, same as
    // llm_dedup_incremental's
    "llm_dedup_bloom_inc" ->
      """WITH idx AS (
        |  SELECT DISTINCT md5(text) AS content_hash
        |  FROM documents WHERE doc_id < 400),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 400
        |  UNION ALL
        |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id < 50
        |  UNION ALL
        |  SELECT doc_id + 3000000, text FROM documents
        |  WHERE doc_id >= 400 AND doc_id < 420),
        |ib AS (SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        |         COUNT(*) AS n_in_batch
        |       FROM batch GROUP BY 1)
        |SELECT keep_id, n_in_batch, content_hash
        |FROM ib
        |WHERE content_hash NOT IN (SELECT content_hash FROM idx)
        |ORDER BY keep_id""".stripMargin,
    "llm_dedup_incremental" ->
      """WITH idx AS (
        |  SELECT DISTINCT md5(text) AS content_hash
        |  FROM documents WHERE doc_id < 400),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 400
        |  UNION ALL
        |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id < 50
        |  UNION ALL
        |  SELECT doc_id + 3000000, text FROM documents
        |  WHERE doc_id >= 400 AND doc_id < 420),
        |ib AS (SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        |         COUNT(*) AS n_in_batch
        |       FROM batch GROUP BY 1)
        |SELECT keep_id, n_in_batch, content_hash
        |FROM ib
        |WHERE content_hash NOT IN (SELECT content_hash FROM idx)
        |ORDER BY keep_id""".stripMargin,
    "llm_snapshot_diff" ->
      """WITH a AS (
        |  SELECT doc_id, md5(CASE WHEN doc_id >= 100 AND doc_id < 120
        |                          THEN text || ' [rev1]' ELSE text END) AS ha
        |  FROM documents WHERE doc_id < 450),
        |b AS (SELECT doc_id, md5(text) AS hb
        |      FROM documents WHERE doc_id >= 50),
        |j AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, ha, hb
        |      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
        |SELECT CASE WHEN ha IS NULL THEN 'added'
        |            WHEN hb IS NULL THEN 'removed'
        |            WHEN ha = hb THEN 'unchanged'
        |            ELSE 'changed' END AS status,
        |  COUNT(*) AS n_docs, MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
        |FROM j GROUP BY 1 ORDER BY status""".stripMargin,
    "llm_url_dedup" ->
      """WITH d AS (SELECT doc_id, source, lang FROM documents),
        |crawl AS (
        |  SELECT doc_id*10 AS crawl_id,
        |    'https://' || source || '.Example.COM:443/docs/' || doc_id ||
        |      '?utm_source=feed&lang=' || lang || '#sec1' AS url FROM d
        |  UNION ALL
        |  SELECT doc_id*10+1,
        |    'HTTPS://' || source || '.example.com/docs/' || doc_id ||
        |      '/?lang=' || lang || '&utm_campaign=x'
        |  FROM d WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id*10+2,
        |    'https://' || source || '.example.com/docs/' || doc_id ||
        |      '?lang=' || lang || '&ref=rss'
        |  FROM d WHERE doc_id % 3 = 0),
        |c AS (
        |  SELECT crawl_id,
        |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
        |    regexp_replace(lower(regexp_extract(url,
        |      '^[A-Za-z]+://([^/?#]+)', 1)), ':(443|80)$', '') AS host,
        |    regexp_replace(regexp_extract(url,
        |      '^[A-Za-z]+://[^/?#]+(/[^?#]*)', 1), '/$', '') AS path,
        |    list_filter(string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
        |      p -> NOT regexp_matches(p, '^(utm_[a-z]+|ref|fbclid)=')
        |           AND p <> '') AS qs
        |  FROM crawl),
        |u AS (
        |  SELECT crawl_id,
        |    scheme || '://' || host || path ||
        |      CASE WHEN len(qs) > 0
        |           THEN '?' || array_to_string(list_sort(qs), '&')
        |           ELSE '' END AS canonical_url
        |  FROM c)
        |SELECT canonical_url, MIN(crawl_id) AS keep_crawl,
        |  COUNT(*) AS n_variants
        |FROM u GROUP BY 1 ORDER BY keep_crawl""".stripMargin,
    "llm_dedup_minhash" ->
      s"""WITH ${shingleCte(3)},
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
        |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT d1, d2, inter, s1.n + s2.n - inter AS uni
        |FROM p JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |WHERE 5 * inter >= 3 * (s1.n + s2.n - inter)
        |ORDER BY d1, d2""".stripMargin,
    // the survivors oracle nests the SAME recursive-CTE cluster
    // resolution as llm_dedup_clusters (the two gates cannot drift),
    // then applies the keep-longest policy as a window rank
    "llm_dedup_survivors" ->
      s"""WITH RECURSIVE ${shingleCte(3)},
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
        |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |pairs AS (SELECT d1, d2
        |  FROM p JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |  WHERE 5 * inter >= 3 * (s1.n + s2.n - inter)),
        |edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
        |nodes AS (SELECT DISTINCT d1 AS doc FROM edges),
        |reach(doc, lab) AS (
        |  SELECT doc, doc FROM nodes
        |  UNION
        |  SELECT e.d2, r.lab FROM reach r JOIN edges e ON e.d1 = r.doc
        |),
        |cl AS (SELECT doc AS doc_id, MIN(lab) AS cluster_rep
        |       FROM reach GROUP BY doc),
        |r AS (SELECT cluster_rep, cl.doc_id, n_chars,
        |        ROW_NUMBER() OVER (PARTITION BY cluster_rep
        |                           ORDER BY n_chars DESC, cl.doc_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY cluster_rep) AS n_members
        |      FROM cl JOIN documents d ON cl.doc_id = d.doc_id)
        |SELECT cluster_rep, n_members, doc_id AS survivor_doc_id,
        |  n_chars AS survivor_chars
        |FROM r WHERE rn = 1 AND n_members > 1
        |ORDER BY cluster_rep""".stripMargin,
    "llm_dedup_clusters" ->
      s"""WITH RECURSIVE ${shingleCte(3)},
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
        |      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2),
        |pairs AS (SELECT d1, d2
        |  FROM p JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |  WHERE 5 * inter >= 3 * (s1.n + s2.n - inter)),
        |edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
        |nodes AS (SELECT DISTINCT d1 AS doc FROM edges),
        |reach(doc, lab) AS (
        |  SELECT doc, doc FROM nodes
        |  UNION
        |  SELECT e.d2, r.lab FROM reach r JOIN edges e ON e.d1 = r.doc
        |)
        |SELECT doc AS doc_id, MIN(lab) AS cluster_rep
        |FROM reach GROUP BY doc ORDER BY doc_id""".stripMargin,
    "llm_jaccard_ngram" ->
      s"""WITH ${shingleCte(4)},
        |keep AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= $JaccardDfCap),
        |k AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM k GROUP BY 1),
        |p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
        |      FROM k a JOIN k b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT d1, d2, inter, s1.n + s2.n - inter AS uni
        |FROM p JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
        |WHERE 2 * inter >= s1.n + s2.n - inter
        |ORDER BY d1, d2""".stripMargin,
    "llm_dedup_simhash" ->
      s"""WITH ${shingleCte(3)},
        |h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS hv FROM sh),
        |bits AS (SELECT doc_id, i,
        |           CASE WHEN SUM(CASE WHEN (hv >> i) & 1 = 1 THEN 1 ELSE -1 END) >= 0
        |                THEN 1 ELSE 0 END AS b
        |         FROM h, unnest(range(0, 32)) AS t(i) GROUP BY 1, 2),
        |sig AS (SELECT doc_id, SUM(b * (1::BIGINT << i))::BIGINT AS sh32
        |        FROM bits GROUP BY 1)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(bit_count(xor(a.sh32, b.sh32)) AS BIGINT) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh32, b.sh32)) <= 3
        |ORDER BY d1, d2""".stripMargin,
    "llm_ivf_cells" ->
      """WITH v0 AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        |           FROM embeddings),
        |cent AS (SELECT c, list_transform(range(0, 64), d ->
        |    ('0x' || substr(md5('ivf_' || c::VARCHAR || '_' || d::VARCHAR), 1, 15))::BIGINT::DOUBLE
        |    / 576460752303423488.0 - 1.0) AS w
        |  FROM range(0, 4) t(c)),
        |dots AS (SELECT vec_id, c,
        |    list_reduce(list_transform(range(1, 65), k -> v[k] * w[k]),
        |                (a, b) -> a + b) AS dot
        |  FROM v0, cent),
        |cells AS (SELECT vec_id, c,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS rn
        |  FROM dots)
        |SELECT c::INT AS cell, COUNT(*) AS n_vecs,
        |  MIN(vec_id) AS first_vec, MAX(vec_id) AS last_vec
        |FROM cells WHERE rn = 1 GROUP BY 1 ORDER BY cell""".stripMargin,
    "llm_dedup_embedding" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        |           FROM embeddings),
        |n AS (SELECT vec_id, v,
        |        sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
        |      FROM v)
        |SELECT a.vec_id AS i, b.vec_id AS j,
        |  list_reduce(list_transform(range(1, 65), k -> a.v[k] * b.v[k]),
        |              (x, y) -> x + y) / (a.nrm * b.nrm) AS cos_sim
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_reduce(list_transform(range(1, 65), k -> a.v[k] * b.v[k]),
        |                  (x, y) -> x + y) / (a.nrm * b.nrm) >= 0.45
        |ORDER BY i, j""".stripMargin,
    // the approximate mode's oracle REBUILDS the quantizer (same md5
    // centroid formula and lowest-cell-on-ties argmax as llm_ivf_cells)
    // and pairs strictly within cells — an independent SQL replay of
    // exactly the candidate pruning the Spark side performs
    "llm_dedup_embedding_approx" ->
      """WITH v0 AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        |           FROM embeddings),
        |cent AS (SELECT c, list_transform(range(0, 64), d ->
        |    ('0x' || substr(md5('ivf_' || c::VARCHAR || '_' || d::VARCHAR), 1, 15))::BIGINT::DOUBLE
        |    / 576460752303423488.0 - 1.0) AS w
        |  FROM range(0, 4) t(c)),
        |dots AS (SELECT vec_id, c,
        |    list_reduce(list_transform(range(1, 65), k -> v[k] * w[k]),
        |                (a, b) -> a + b) AS dot
        |  FROM v0, cent),
        |cell1 AS (SELECT vec_id, c AS cell FROM (
        |    SELECT vec_id, c,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS rn
        |    FROM dots) WHERE rn = 1),
        |n AS (SELECT v0.vec_id, v, cell,
        |        sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
        |      FROM v0 JOIN cell1 USING (vec_id))
        |SELECT a.vec_id AS i, b.vec_id AS j,
        |  list_reduce(list_transform(range(1, 65), k -> a.v[k] * b.v[k]),
        |              (x, y) -> x + y) / (a.nrm * b.nrm) AS cos_sim
        |FROM n a JOIN n b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |WHERE list_reduce(list_transform(range(1, 65), k -> a.v[k] * b.v[k]),
        |                  (x, y) -> x + y) / (a.nrm * b.nrm) >= 0.45
        |ORDER BY i, j""".stripMargin,
    // independent replay of the span detector: positions via range
    // unnest, cross-doc df on the raw gram, lag-gap span merge, per-doc
    // aggregate — every step integer/string-exact in both engines
    "llm_substring_spans" ->
      """WITH pos AS (
        |  SELECT doc_id, length(text)::BIGINT AS len, i,
        |         substr(text, i::INTEGER + 1, 24) AS g
        |  FROM documents, LATERAL unnest(range(0, length(text) - 24 + 1)) AS t(i)
        |  WHERE length(text) >= 24),
        |dup AS (SELECT g FROM pos GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
        |hit AS (SELECT doc_id, len, i FROM pos JOIN dup USING (g)),
        |mk AS (SELECT doc_id, len, i,
        |        CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
        |             OR i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 24
        |        THEN 1 ELSE 0 END AS brk FROM hit),
        |sp AS (SELECT doc_id, len, i,
        |         sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS span_id
        |       FROM mk),
        |spans AS (SELECT doc_id, len, span_id, min(i) AS s, max(i) + 24 AS e
        |          FROM sp GROUP BY 1, 2, 3)
        |SELECT doc_id, count(*)::BIGINT AS n_spans, sum(e - s)::BIGINT AS chars_dup,
        |  ((1000000 * sum(e - s)) // max(len))::BIGINT AS dup_ppm,
        |  min(s)::BIGINT AS first_s, max(e)::BIGINT AS last_e
        |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // SemDeDup replay: the approx-mode quantizer + same-cell pair CTEs,
    // components via the same recursive-CTE reachability as
    // llm_dedup_clusters, keep policy as a row_number over the
    // identically-folded cos-to-centroid
    "llm_semdedup" ->
      """WITH RECURSIVE v0 AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        |           FROM embeddings),
        |cent AS (SELECT c, list_transform(range(0, 64), d ->
        |    ('0x' || substr(md5('ivf_' || c::VARCHAR || '_' || d::VARCHAR), 1, 15))::BIGINT::DOUBLE
        |    / 576460752303423488.0 - 1.0) AS w
        |  FROM range(0, 4) t(c)),
        |dots AS (SELECT vec_id, c,
        |    list_reduce(list_transform(range(1, 65), k -> v[k] * w[k]),
        |                (a, b) -> a + b) AS dot
        |  FROM v0, cent),
        |cell1 AS (SELECT vec_id, c AS cell FROM (
        |    SELECT vec_id, c,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) AS rn
        |    FROM dots) WHERE rn = 1),
        |n AS (SELECT v0.vec_id, v, cell,
        |        sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
        |      FROM v0 JOIN cell1 USING (vec_id)),
        |pairs AS (SELECT a.vec_id AS d1, b.vec_id AS d2
        |  FROM n a JOIN n b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_reduce(list_transform(range(1, 65), k -> a.v[k] * b.v[k]),
        |                    (x, y) -> x + y) / (a.nrm * b.nrm) >= 0.45),
        |edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
        |nodes AS (SELECT DISTINCT d1 AS doc FROM edges),
        |reach(doc, lab) AS (
        |  SELECT doc, doc FROM nodes
        |  UNION
        |  SELECT e.d2, r.lab FROM reach r JOIN edges e ON e.d1 = r.doc
        |),
        |lbl AS (SELECT doc, MIN(lab) AS lab FROM reach GROUP BY doc),
        |cw AS (SELECT c, w,
        |         sqrt(list_reduce(list_transform(w, x -> x * x), (a, b) -> a + b)) AS wn
        |       FROM cent),
        |cosc AS (SELECT n.vec_id, lbl.lab,
        |    list_reduce(list_transform(range(1, 65), k -> n.v[k] * cw.w[k]),
        |                (a, b) -> a + b) / (n.nrm * cw.wn) AS cos_c
        |  FROM n JOIN lbl ON n.vec_id = lbl.doc JOIN cw ON cw.c = n.cell),
        |rk AS (SELECT lab, vec_id, cos_c,
        |         row_number() OVER (PARTITION BY lab ORDER BY cos_c, vec_id) AS rn,
        |         count(*) OVER (PARTITION BY lab) AS nm
        |       FROM cosc)
        |SELECT lab AS cluster_rep, nm::BIGINT AS n_members, vec_id AS keep_vec_id
        |FROM rk WHERE rn = 1 ORDER BY cluster_rep""".stripMargin,
    // excision replay: same span CTE, kept intervals via lag + per-doc
    // tail, ordered string_agg reassembly, md5 equality evidence
    "llm_substring_excise" ->
      """WITH pos AS (
        |  SELECT doc_id, length(text)::BIGINT AS len, i,
        |         substr(text, i::INTEGER + 1, 24) AS g
        |  FROM documents, LATERAL unnest(range(0, length(text) - 24 + 1)) AS t(i)
        |  WHERE length(text) >= 24),
        |dup AS (SELECT g FROM pos GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
        |hit AS (SELECT doc_id, len, i FROM pos JOIN dup USING (g)),
        |mk AS (SELECT doc_id, len, i,
        |        CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
        |             OR i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) > 24
        |        THEN 1 ELSE 0 END AS brk FROM hit),
        |sp AS (SELECT doc_id, len, i,
        |         sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS span_id
        |       FROM mk),
        |spans AS (SELECT doc_id, len, span_id, min(i) AS s, max(i) + 24 AS e
        |          FROM sp GROUP BY 1, 2, 3),
        |kept AS (
        |  SELECT doc_id, coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS ks,
        |         s AS ke
        |  FROM spans
        |  UNION ALL
        |  SELECT doc_id, max(e), max(len) FROM spans GROUP BY doc_id),
        |recon AS (
        |  SELECT k.doc_id,
        |         sum(ke - ks) AS clean_len,
        |         md5(string_agg(substr(d.text, ks::INTEGER + 1, (ke - ks)::INTEGER),
        |                        '' ORDER BY ks)) AS clean_md5
        |  FROM kept k JOIN documents d USING (doc_id)
        |  WHERE ks < ke GROUP BY k.doc_id)
        |SELECT spans.doc_id, count(*)::BIGINT AS n_cut,
        |  sum(e - s)::BIGINT AS chars_cut,
        |  coalesce(max(recon.clean_len), 0)::BIGINT AS clean_len,
        |  coalesce(max(recon.clean_md5), md5('')) AS clean_md5
        |FROM spans LEFT JOIN recon ON spans.doc_id = recon.doc_id
        |GROUP BY spans.doc_id ORDER BY spans.doc_id""".stripMargin
  )
}
