package graft.ops.llm

/** The engine's ONE cross-engine hash: a 60-bit non-negative bigint from
  * the first 15 hex chars of md5 — bit-identical in Spark
  * (`conv(substr(md5(x),1,15),16,10)`) and DuckDB
  * (`('0x'||substr(md5(x),1,15))::BIGINT`). Every oracle-visible hash
  * (SimHash signatures, LSH hyperplanes, winnowing fingerprints,
  * sampling buckets) derives from this single definition so the
  * determinism-critical expression can never drift between queries.
  */
private[llm] object CrossHash {

  /** Spark SQL expression string: hex60 of `inner` as BIGINT. */
  def hex60(inner: String): String =
    s"cast(conv(substr(md5($inner), 1, 15), 16, 10) as bigint)"

  /** DuckDB twin of [[hex60]]. */
  def hex60Sql(inner: String): String =
    s"('0x' || substr(md5($inner), 1, 15))::BIGINT"
}
