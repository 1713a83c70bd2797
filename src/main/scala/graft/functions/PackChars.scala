package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `graft_pack8(str, start)` — packs the 7
  * bytes of `str` at 0-based offsets `start .. start+6` into one long,
  * 8 bits per byte, big-endian (`acc = acc·256 + (byte & 0xff)`), with
  * positions past the end packing as 0 — below every real byte, so a
  * shorter suffix that prefixes a longer one sorts first (plain
  * byte-string comparison semantics).
  *
  * This is the [[graft.ops.llm.SuffixIndex]] seed-rank key: an
  * order-preserving integer for the first 7 BYTES of the suffix at
  * `start`. Byte-level (UTF-8) semantics by design — the round-9 form
  * (`graft_pack7`) masked each byte to 7 bits, which is order-preserving
  * only on ASCII: a masked continuation byte (0x80+) collides with an
  * ASCII byte, so two DIFFERENT non-ASCII suffixes could spuriously tie.
  * Full 8-bit bytes at 7 per long (56 bits, always non-negative) order
  * ARBITRARY byte strings correctly, and UTF-8 byte order IS code-point
  * order — so the induced suffix order on any multilingual corpus is the
  * code-point-lexicographic order a user expects. (NUL bytes pack as 0,
  * colliding with past-end; real text corpora contain no NUL — the same
  * sentinel contract every doubling-based suffix builder makes.)
  *
  * Why a custom Expression (the preference order — compose built-ins >
  * native Expression > UDF): the built-in spelling needs a per-document
  * codes ARRAY just to get O(1) access, because `substring` on
  * UTF8String seeks O(start) per call — so every position row drags
  * array allocations through the seed, measured as the seed stage's
  * dominant cost. `UTF8String.getByte` IS O(1); a fused 7-iteration
  * byte loop replaces all of it with zero allocation, inside
  * whole-stage codegen.
  *
  * Null contract: null if either argument is null (BinaryExpression
  * default); a negative `start` is a caller bug and packs from byte 0
  * semantics-free (the suffix index only ever passes `i ≥ 0`).
  */
case class PackBytes8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int) arguments, got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pack8"

  override def nullSafeEval(s: Any, startAny: Any): Any = {
    val str = s.asInstanceOf[UTF8String]
    val start = startAny.asInstanceOf[Int]
    val n = str.numBytes()
    var acc = 0L
    var k = 0
    while (k < 7) {
      val idx = start + k
      acc = acc * 256L + (if (idx >= 0 && idx < n) (str.getByte(idx) & 0xff).toLong else 0L)
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
         |for (int $k = 0; $k < 7; $k++) {
         |  int $idx = $start + $k;
         |  $acc = $acc * 256L +
         |    (($idx >= 0 && $idx < $n) ? (long) ($s.getByte($idx) & 0xff) : 0L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackBytes8 =
    copy(left = newLeft, right = newRight)
}
