package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.config.Conf

/** Config-drivable processors wrapping the engine's data-curation
  * operators (SURVEY.md §2 C36/C39), so a YAML pipeline can run the
  * LLM-data steps the same way the reference runs its uppercase transform
  * — declaratively, lazily, fused by Catalyst across the whole chain.
  *
  * All are pure `DataFrame => DataFrame` (no actions, no state), so they
  * compose in any order and work identically in batch and streaming
  * pipelines (dedup in streaming should use
  * [[graft.streaming.StreamOps.dedup]] to get watermark-bounded state).
  */

/** C36 exact dedup on configured columns (default: content hash of
  * `text`). `keep: first` semantics come from dropDuplicates.
  */
final class ExactDedupProcessor(params: Conf) extends Transform {
  private val cols: Seq[String] = params.opt("columns") match {
    case Some(l: List[_]) => l.map(_.toString)
    case _                => Seq("content_hash")
  }
  def apply(df: DataFrame): DataFrame = {
    val withHash =
      if (cols == Seq("content_hash") && !df.columns.contains("content_hash"))
        df.withColumn("content_hash", md5(encode(col("text"), "UTF-8")))
      else df
    withHash.dropDuplicates(cols)
  }
}

/** C39 token statistics: appends `n_tokens` / `n_chars_computed` derived
  * from a configurable text column.
  */
final class TokenStatsProcessor(params: Conf) extends Transform {
  private val textCol = params.str("text_column").getOrElse("text")
  // single-space split, NOT "\\s+": must agree with the gated text
  // queries (graft.ops.llm.TextStats) and their DuckDB string_split
  // oracles, or the pipeline and query surfaces disagree on n_tokens
  def apply(df: DataFrame): DataFrame =
    df.withColumn("n_tokens", size(split(col(textCol), " ")).cast("long"))
      .withColumn("n_chars_computed", length(col(textCol)).cast("long"))
}

/** Ingest-tier Unicode NFC normalization of a configurable text column —
  * the canonical-spelling pass that must run BEFORE any hash-based
  * processor ([[ExactDedupProcessor]], [[CdcChunkProcessor]]) so
  * precomposed and decomposed spellings of the same grapheme land on the
  * same bytes. Pure per-row projection (the native `graft_nfc`
  * expression), so it is streaming-legal and Catalyst-fused.
  */
final class NfcNormalizeProcessor(spark: org.apache.spark.sql.SparkSession,
                                  params: Conf) extends Transform {
  graft.functions.GraftFunctions.register(spark)
  private val textCol = params.str("text_column").getOrElse("text")
  // call_function, not expr-string interpolation: a column name needing
  // quoting (spaces, dots, backticks) must resolve, not break the parser
  def apply(df: DataFrame): DataFrame =
    df.withColumn(textCol, call_function("graft_nfc", col(textCol)))
}

/** C36 content-defined chunking: explode each document into CDC chunk
  * rows via the pure-projection chunker — the pipeline form of
  * [[graft.ops.llm.Dedup.cdcChunkRows]]; follow with
  * `dedup_exact(columns=[h])` for chunk-level dedup, in batch or
  * streaming (the [[graft.streaming.ChunkDedupStream]] architecture,
  * config-driven).
  *
  * Declared output schema (the pipeline-boundary contract — ADVICE r10:
  * the r10 byte-semantics change had widened it silently):
  *   - `doc_id`, `j` — document id and 1-based chunk ordinal;
  *   - `chunk` — the chunk BYTES reinterpreted as a string (CDC cuts on
  *     the UTF-8 byte stream, so a boundary may split a multi-byte
  *     character; the reinterpret is byte-preserving and total where a
  *     decode would throw or substitute);
  *   - `nb` — exact chunk width in BYTES (trustworthy even when `chunk`
  *     is not cleanly decodable);
  *   - `h` — md5 of the raw byte slice, the chunk's dedup identity;
  *   - `chunk_valid_utf8` — true iff `chunk` is well-formed UTF-8, i.e.
  *     the cut did NOT land mid-character and downstream consumers may
  *     treat `chunk` as text. Computed as the md5 round-trip
  *     `md5(encode(chunk)) = h`: re-encoding substitutes U+FFFD for any
  *     malformed sequence, so equality with the raw-byte hash proves
  *     well-formedness without carrying the byte slice itself.
  */
final class CdcChunkProcessor(params: Conf) extends Transform {
  private val textCol = params.str("text_column").getOrElse("text")
  private val idCol   = params.str("id_column").getOrElse("doc_id")
  // a typo'd/unsupported param must fail loudly at build time, not be
  // silently ignored (a configured knob with no effect is a config trap)
  private val unknown = params.m.keySet -- Set("text_column", "id_column")
  require(unknown.isEmpty,
    s"cdc_chunk: unsupported params ${unknown.toSeq.sorted.mkString(", ")} " +
    "(supported: text_column, id_column)")
  def apply(df: DataFrame): DataFrame =
    graft.ops.llm.Dedup.cdcChunkRows(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")))
      .withColumn("chunk_valid_utf8",
        md5(encode(col("chunk"), "UTF-8")) === col("h"))
}

/** C39 quality filter: keep documents within configured token bounds. */
final class QualityFilterProcessor(params: Conf) extends Transform {
  private val textCol = params.str("text_column").getOrElse("text")
  private val minTokens = params.str("min_tokens").map(_.toInt).getOrElse(1)
  private val maxTokens = params.str("max_tokens").map(_.toInt).getOrElse(Int.MaxValue)
  def apply(df: DataFrame): DataFrame = {
    val n = size(split(col(textCol), " ")) // same tokenization as TextStats
    df.filter(n >= minTokens && n <= maxTokens)
  }
}

/** Benchmark decontamination as a pipeline stage: drop documents whose
  * distinct 4-gram containment ratio against the benchmark set at
  * `benchmark_path` (a parquet of documents; its grams are extracted
  * with the SAME shingle expression) reaches `max_ppm` (default 100000 =
  * 10%). The exact gate-proven rule (`llm_contamination_ratio`), joined
  * back as a LEFT ANTI on the id column so arbitrary extra columns pass
  * through untouched. Batch-legal and foreachBatch-legal (the
  * [[graft.streaming.DecontamStream]] path); a bare streaming DF should
  * use that stream's ingest wrapper instead (the per-doc aggregate would
  * otherwise become unbounded cross-batch state).
  */
final class DecontaminateProcessor(params: Conf) extends Transform {
  private val benchPath = params.str("benchmark_path").getOrElse(
    throw new IllegalArgumentException(
      "decontaminate needs a 'benchmark_path' param"))
  private val idCol   = params.str("id_column").getOrElse("doc_id")
  private val textCol = params.str("text_column").getOrElse("text")
  private val maxPpm  = params.str("max_ppm").map(_.toLong).getOrElse(100000L)
  private val unknown = params.m.keySet --
    Set("benchmark_path", "id_column", "text_column", "max_ppm")
  require(unknown.isEmpty,
    s"decontaminate: unsupported params ${unknown.toSeq.sorted.mkString(", ")} " +
    "(supported: benchmark_path, id_column, text_column, max_ppm)")
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val bench = graft.ops.llm.Dedup.shinglesFrom(
        spark.read.parquet(benchPath)
          .select(col(idCol).as("doc_id"), col(textCol).as("text")),
        4, distinct = true)
      .select(col("s")).distinct()
    val sh = graft.ops.llm.Dedup.shinglesFrom(
      df.select(col(idCol).as("doc_id"), col(textCol).as("text")),
      4, distinct = true)
    val flagged = graft.ops.llm.TextStats.contaminationRatioFrom(sh, bench)
      .where(col("ppm") >= maxPpm)
      .select(col("doc_id").as(idCol))
    df.join(flagged, Seq(idCol), "left_anti")
  }
}

/** T5-style span corruption as a pipeline stage: replaces the text
  * column with the corrupted INPUT and appends the sentinel-delimited
  * TARGET (`llm_span_corrupt`'s gate-proven transform). Batch-legal (the
  * splice needs a per-document window); run inside foreachBatch for
  * streaming tokenization jobs.
  */
final class SpanCorruptProcessor(params: Conf) extends Transform {
  private val idCol   = params.str("id_column").getOrElse("doc_id")
  private val textCol = params.str("text_column").getOrElse("text")
  private val unknown = params.m.keySet -- Set("id_column", "text_column")
  require(unknown.isEmpty,
    s"span_corrupt: unsupported params ${unknown.toSeq.sorted.mkString(", ")} " +
    "(supported: id_column, text_column)")
  def apply(df: DataFrame): DataFrame = {
    val texts = graft.ops.llm.TextStats.spanCorruptTextsFrom(
        df.select(col(idCol).as("doc_id"), col(textCol).as("text")))
      .select(col("doc_id").as(idCol),
              col("input_text"), col("target_text"), col("n_spans"))
    // LEFT join: a null-text row produces no corrupted output (posexplode
    // of split(null) yields nothing), and an inner join here silently
    // DROPPED such rows from the pipeline (round-8 advice). Null-text
    // rows now pass through with null input/target and n_spans = 0 —
    // visible to the next stage instead of vanishing.
    df.drop(textCol).join(texts, Seq(idCol), "left_outer")
      .withColumn("n_spans", coalesce(col("n_spans"), lit(0L)))
      .withColumnRenamed("input_text", textCol)
  }
}

