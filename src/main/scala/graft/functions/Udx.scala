package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** The user-defined-function surface (SURVEY.md §2 C33–C34). The engine's
  * design rule is built-ins first (they stay inside codegen — §4), so UDx
  * exists as the documented extension point, kept OUT of hot paths.
  */
object Udx {

  /** C33 scalar UDF: slugify. Kept SQL-mirrorable on purpose
    * (`regexp_replace(lower(trim(s)), '[^a-z0-9]+', '-')`) so UDF results
    * remain oracle-checkable.
    */
  val slugify: Column => Column =
    udf((s: String) =>
      if (s == null) null
      else s.trim.toLowerCase.replaceAll("[^a-z0-9]+", "-")).apply(_)

  /** C34 typed Aggregator: element-wise minimum over fixed-width signature
    * arrays — the MinHash signature combiner (SURVEY.md §2 C37's custom
    * piece). The reduction is commutative + associative, so Spark can
    * apply it map-side and merge partials in any order: the signature of
    * a 100 TB partition tree is exact regardless of partitioning.
    */
  final class MinSignatureAggregator(width: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    import org.apache.spark.sql.{Encoder, Encoders}
    def zero: Array[Long] = Array.fill(width)(Long.MaxValue)
    def reduce(buf: Array[Long], row: Array[Long]): Array[Long] = {
      var i = 0
      while (i < width) { if (row(i) < buf(i)) buf(i) = row(i); i += 1 }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = reduce(a, b)
    def finish(buf: Array[Long]): Array[Long] = buf
    def bufferEncoder: Encoder[Array[Long]] = Encoders.javaSerialization
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Deterministic k-wide hash family for MinHash signatures (seeded
    * MurmurHash3 — engine-internal; signatures never cross the oracle
    * boundary, see graft.ops.llm.Dedup).
    */
  def hashFamily(s: String, k: Int): Array[Long] = {
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val h1 = scala.util.hashing.MurmurHash3.stringHash(s, i)
      val h2 = scala.util.hashing.MurmurHash3.stringHash(s, i + 0x9e3779b9)
      out(i) = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      i += 1
    }
    out
  }
}
