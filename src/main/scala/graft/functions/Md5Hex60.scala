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
    fold(d)
  }

  /** [[compute]] over the byte slice `[pos, pos+len)` of `s` (clamped at
    * the string's end; empty slice hashes like the empty string) —
    * WITHOUT a substring's O(pos) character seek, its UTF8String
    * allocation, or the whole-string byte copy `getBytes` makes. The
    * scratch copy is the only allocation. BYTE semantics by design
    * (the declared contract of every gram-hash consumer — winnowing,
    * CDC — since round 10): `pos`/`len` are UTF-8 byte offsets, equal
    * to char offsets exactly when the text is ASCII. Same byte-level
    * contract as [[PackBytes8]].
    */
  def computeAt(s: UTF8String, pos: Int, len: Int): Long = {
    val n = s.numBytes()
    val from = math.max(pos, 0)
    val until = math.min(from + math.max(len, 0), n)
    val m = math.max(until - from, 0)
    val buf = new Array[Byte](m)
    var k = 0
    while (k < m) { buf(k) = s.getByte(from + k); k += 1 }
    fold(org.apache.commons.codec.digest.DigestUtils.md5(buf))
  }

  private def fold(d: Array[Byte]): Long =
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
     ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
     ((d(6) & 0xffL) << 8)  |  (d(7) & 0xffL)) >>> 4
}

/** Native Catalyst expression: `graft_md5_60_at(str, pos0, len)` — the
  * gram-hash form of [[Md5Hex60]]: hashes the byte slice at 0-based
  * `pos0` of width `len` in place. Every per-position gram consumer
  * (winnowing, CDC boundaries) previously spelled this
  * `graft_md5_60(substring(text, i+1, k))`, paying an O(i) character
  * seek per position (UTF8String has no random char access) — O(len²)
  * per document across the position explode — plus two allocations.
  * `getByte` is O(1); this is the md5 twin of [[PackChars7]].
  *
  * Null contract: null if any argument is null (TernaryExpression
  * default). Clamping matches SQL substring's (shorter tail near the
  * end, empty past it).
  */
case class Md5Hex60At(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, org.apache.spark.sql.types.IntegerType,
            org.apache.spark.sql.types.IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int, int) arguments, got " +
          s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_md5_60_at"

  override def nullSafeEval(s: Any, pos: Any, len: Any): Any =
    Md5Hex60.computeAt(s.asInstanceOf[UTF8String],
      pos.asInstanceOf[Int], len.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p, l) =>
      s"graft.functions.Md5Hex60.computeAt($s, $p, $l)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Md5Hex60At =
    copy(first = newFirst, second = newSecond, third = newThird)
}
