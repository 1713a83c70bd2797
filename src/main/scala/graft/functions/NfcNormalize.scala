package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `graft_nfc(string)` — Unicode NFC
  * (canonical composition) normalization, the first transform of any
  * text-ingest tier: crawled text mixes precomposed ("é", U+00E9) and
  * decomposed ("e"+U+0301) spellings of the SAME grapheme, and every
  * hash-based operator downstream (exact dedup, CDC chunks, winnowing,
  * shingles) treats them as different bytes unless ingestion
  * canonicalizes. Spark ships no normalization builtin, so this is the
  * custom-Expression tier (SURVEY §2 C33 preference order: native
  * expression > UDF): `doGenCode` emits a single static call and an
  * ASCII fast path keeps the common case allocation-free (NFC is the
  * identity on ASCII, which is most corpus bytes).
  *
  * Cross-engine contract: `java.text.Normalizer` implements UAX #15
  * canonical composition, as does DuckDB's `nfc_normalize` — same
  * standard, same output — verified by the `llm_nfc_census` gate's
  * hash-match on planted decomposed sequences.
  *
  * Null contract: null in, null out (UnaryExpression default).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static (Java-callable) so generated code stays a single call. The
    * all-ASCII fast path returns the INPUT UTF8String — zero copies —
    * because NFC cannot alter ASCII.
    */
  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) s
    else {
      val str = s.toString
      val norm = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
      if (norm eq str) s else UTF8String.fromString(norm)
    }
  }
}
