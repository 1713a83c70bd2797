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
