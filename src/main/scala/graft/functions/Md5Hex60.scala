package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `graft_md5_60(string)` — the engine's
  * cross-engine 60-bit hash (graft.ops.llm.CrossHash) computed DIRECTLY
  * from the md5 digest bytes.
  *
  * The SQL form `cast(conv(substr(md5(x),1,15),16,10) as bigint)`
  * materializes a 32-char hex string, copies a 15-char substring, and
  * parses it back — three allocations and a base conversion per row, in
  * the innermost loop of every fingerprint/SimHash/winnow query. The
  * first 15 hex chars ARE the first 7.5 digest bytes, so the value is
  * just the big-endian first-8-bytes word shifted right 4:
  * bit-identical to the SQL form (and to DuckDB's
  * `('0x'||substr(md5(x),1,15))::BIGINT`), proven by Md5Hex60Spec's
  * exhaustive comparison and by every gate that uses it.
  *
  * Null contract: null in, null out (UnaryExpression default).
  */
case class Md5Hex60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_60"

  override def nullSafeEval(input: Any): Any =
    Md5Hex60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Hex60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hex60 =
    copy(child = newChild)
}

object Md5Hex60 {
  /** Big-endian first-8-bytes of md5(s) >>> 4 == parseLong(hex[0..15), 16).
    * Static (Java-callable) so generated code stays a single call.
    */
  def compute(s: UTF8String): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(s.getBytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
     ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
     ((d(6) & 0xffL) << 8)  |  (d(7) & 0xffL)) >>> 4
  }
}
