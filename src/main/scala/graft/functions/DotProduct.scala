package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: `graft_dot(array<double>, array<double>)` —
  * the strict left-to-right dot product (SURVEY.md §2 C38's hot scalar).
  *
  * Why a custom Expression (the "custom operators" preference order —
  * compose built-ins > native Expression > UDF): the built-in form
  * `aggregate(zip_with(a, b, *), 0d, +)` allocates an intermediate
  * 64-element array per row and evaluates a lambda chain; this expression
  * generates a tight fused loop via `doGenCode`, staying inside
  * whole-stage codegen with zero allocation. A Scala UDF would be worse
  * than both (boxing + serialization on every call).
  *
  * Semantics are IDENTICAL to the fold: `acc = 0; acc += a[i]*b[i]`
  * left-to-right — the same IEEE-754 operation sequence as DuckDB's
  * `list_reduce`, so results remain bit-identical across engines and the
  * DuckDB oracle still hash-matches (see graft.ops.llm.Similarity).
  *
  * Null contract: null if either array is null (BinaryExpression default);
  * null ELEMENTS are treated as 0 contribution (skip), matching
  * `zip_with`'s null-propagating product summed by a null-skipping fold.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}Acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    ${ev.value}Acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = ${ev.value}Acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Function registration: per-session (idempotent) and the
  * `spark.sql.extensions` injection path.
  */
object GraftFunctions {

  private val info = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")

  private def builder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_dot expects exactly 2 arguments")
    DotProduct(children.head, children(1))
  }

  private val md5Info =
    new ExpressionInfo(classOf[Md5Hex60].getName, "graft_md5_60")

  private def md5Builder(children: Seq[Expression]): Expression = {
    require(children.length == 1, "graft_md5_60 expects exactly 1 argument")
    Md5Hex60(children.head)
  }

  private val nfcInfo =
    new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc")

  private def nfcBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 1, "graft_nfc expects exactly 1 argument")
    NfcNormalize(children.head)
  }

  private val md5AtInfo =
    new ExpressionInfo(classOf[Md5Hex60At].getName, "graft_md5_60_at")

  private def md5AtBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 3, "graft_md5_60_at expects exactly 3 arguments")
    Md5Hex60At(children.head, children(1), children(2))
  }

  private val packInfo =
    new ExpressionInfo(classOf[PackBytes8].getName, "graft_pack8")

  private def packBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "graft_pack8 expects exactly 2 arguments")
    PackBytes8(children.head, children(1))
  }

  private val bloomInfo = new ExpressionInfo(
    classOf[BloomMightContain].getName, "graft_bloom_might_contain")

  private def bloomBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      "graft_bloom_might_contain expects exactly 2 arguments")
    BloomMightContain(children.head, children(1))
  }

  /** Register the native functions on a live session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dot"), info, builder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_md5_60"), md5Info, md5Builder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_nfc"), nfcInfo, nfcBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_bloom_might_contain"), bloomInfo, bloomBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_pack8"), packInfo, packBuilder _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_md5_60_at"), md5AtInfo, md5AtBuilder _)
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` — the
  * public injection point, so any session (spark-submit, thrift server)
  * gets the engine's native functions without code changes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("graft_dot"),
       new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
       (children: Seq[Expression]) => {
         require(children.length == 2, "graft_dot expects exactly 2 arguments")
         DotProduct(children.head, children(1))
       }))
    ext.injectFunction(
      (FunctionIdentifier("graft_md5_60"),
       new ExpressionInfo(classOf[Md5Hex60].getName, "graft_md5_60"),
       (children: Seq[Expression]) => {
         require(children.length == 1, "graft_md5_60 expects exactly 1 argument")
         Md5Hex60(children.head)
       }))
    ext.injectFunction(
      (FunctionIdentifier("graft_md5_60_at"),
       new ExpressionInfo(classOf[Md5Hex60At].getName, "graft_md5_60_at"),
       (children: Seq[Expression]) => {
         require(children.length == 3, "graft_md5_60_at expects exactly 3 arguments")
         Md5Hex60At(children.head, children(1), children(2))
       }))
    ext.injectFunction(
      (FunctionIdentifier("graft_pack8"),
       new ExpressionInfo(classOf[PackBytes8].getName, "graft_pack8"),
       (children: Seq[Expression]) => {
         require(children.length == 2, "graft_pack8 expects exactly 2 arguments")
         PackBytes8(children.head, children(1))
       }))
    ext.injectFunction(
      (FunctionIdentifier("graft_nfc"),
       new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
       (children: Seq[Expression]) => {
         require(children.length == 1, "graft_nfc expects exactly 1 argument")
         NfcNormalize(children.head)
       }))
    ext.injectFunction(
      (FunctionIdentifier("graft_bloom_might_contain"),
       new ExpressionInfo(
         classOf[BloomMightContain].getName, "graft_bloom_might_contain"),
       (children: Seq[Expression]) => {
         require(children.length == 2,
           "graft_bloom_might_contain expects exactly 2 arguments")
         BloomMightContain(children.head, children(1))
       }))
    // conf-gated (default off) — injecting them costs nothing until a
    // session opts in; see ApproxDistinctRewrite / RangeJoinBandRewrite
    ext.injectOptimizerRule(_ => ApproxDistinctRewrite)
    ext.injectOptimizerRule(_ => RangeJoinBandRewrite)
  }
}
