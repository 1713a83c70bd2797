package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `graft_pack7(str, start)` — packs the 8
  * bytes of `str` at 0-based offsets `start .. start+7` into one long,
  * 7 bits per byte, big-endian (`acc = acc·128 + byte`), with positions
  * past the end packing as 0 — below every real character, so a shorter
  * suffix that prefixes a longer one sorts first (plain
  * string-comparison semantics).
  *
  * This is the [[graft.ops.llm.SuffixIndex]] seed-rank key: an
  * order-preserving integer for the first 8 characters of the suffix at
  * `start`. Why a custom Expression (the preference order — compose
  * built-ins > native Expression > UDF): the built-in spelling needs a
  * per-document codes ARRAY (`transform(split(text, ''), ascii)`) just
  * to get O(1) character access, because `substring` on UTF8String
  * seeks O(start) per call (no random access by char) — so every
  * position row drags array allocations through the seed, measured as
  * the seed stage's dominant cost. `UTF8String.getByte` IS O(1), and
  * for the ASCII corpora this engine's text gates already assume
  * (bytes ⟺ chars, the same contract the array spelling's `ascii()`
  * relied on), a fused 8-iteration byte loop replaces all of it with
  * zero allocation, inside whole-stage codegen.
  *
  * ASCII contract: bytes are masked to 7 bits; a multi-byte character
  * would pack as its masked UTF-8 bytes — order-preserving within any
  * fixed encoding prefix, but NOT code-point order (exactly the
  * limitation the previous `ascii()`-array spelling had for non-ASCII).
  *
  * Null contract: null if either argument is null (BinaryExpression
  * default); a negative `start` is a caller bug and packs from byte 0
  * semantics-free (the suffix index only ever passes `i ≥ 0`).
  */
case class PackChars7(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int) arguments, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pack7"

  override def nullSafeEval(s: Any, startAny: Any): Any = {
    val str = s.asInstanceOf[UTF8String]
    val start = startAny.asInstanceOf[Int]
    val n = str.numBytes()
    var acc = 0L
    var k = 0
    while (k < 8) {
      val idx = start + k
      acc = acc * 128L + (if (idx >= 0 && idx < n) (str.getByte(idx) & 0x7f).toLong else 0L)
      k += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, start) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $s.numBytes();
         |long $acc = 0L;
         |for (int $k = 0; $k < 8; $k++) {
         |  int $idx = $start + $k;
         |  $acc = $acc * 128L +
         |    (($idx >= 0 && $idx < $n) ? (long) ($s.getByte($idx) & 0x7f) : 0L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackChars7 =
    copy(left = newLeft, right = newRight)
}
