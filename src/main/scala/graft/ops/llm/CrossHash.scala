package graft.ops.llm

/** The engine's ONE cross-engine hash: a 60-bit non-negative bigint from
  * the first 15 hex chars of md5 — bit-identical in Spark
  * (`conv(substr(md5(x),1,15),16,10)`) and DuckDB
  * (`('0x'||substr(md5(x),1,15))::BIGINT`). Every oracle-visible hash
  * (SimHash signatures, LSH hyperplanes, winnowing fingerprints,
  * sampling buckets) derives from this single definition so the
  * determinism-critical expression can never drift between queries.
  */
// private[graft] (was private[ops]): the pipeline test fixtures rebuild
// the quantizer centroids through THIS helper rather than a verbatim
// copy of the md5-hex60 routine (self-review r13 pass 1 — two spellings
// of the determinism-critical hash must not exist)
private[graft] object CrossHash {

  /** Spark SQL expression string: hex60 of `inner` as BIGINT. */
  def hex60(inner: String): String =
    s"cast(conv(substr(md5($inner), 1, 15), 16, 10) as bigint)"

  /** The NATIVE form of [[hex60]] — `graft.functions.Md5Hex60`, digest
    * bytes straight to the long with no hex-string materialization.
    * Bit-identical (Md5Hex60Spec proves it exhaustively); use in hot
    * per-gram/per-shingle paths, after `GraftFunctions.register`.
    */
  def hex60Native(inner: String): String = s"graft_md5_60($inner)"

  /** The STRING form of the same 60 bits: the first 15 hex chars of md5,
    * uncoverted. Lexicographic order over the fixed-width lowercase hex
    * equals numeric order over [[hex60]], so min/sort-based consumers
    * (winnowing) can skip the base-conversion cost (measured ~18% of
    * llm_winnow at sf0.1) when nothing does arithmetic on the value.
    */
  def hex15(inner: String): String =
    s"substr(md5($inner), 1, 15)"

  /** DuckDB twin of [[hex60]]. */
  def hex60Sql(inner: String): String =
    s"('0x' || substr(md5($inner), 1, 15))::BIGINT"

  /** DuckDB twin of [[hex15]] (identical text — both engines' md5 emit
    * lowercase hex).
    */
  def hex15Sql(inner: String): String =
    s"substr(md5($inner), 1, 15)"

  /** JVM twin of [[hex60]], for constants computed once on the driver
    * (e.g. the IVF coarse-quantizer centroids in [[Dedup]]) — same md5,
    * same 15 hex chars, same value any engine would compute.
    */
  def hex60Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(8).map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }
}
