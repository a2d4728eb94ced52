package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFKC normalization as a native codegen'd expression — the
  * compatibility-fold every tokenizer-bound corpus needs (ligature ﬁ →
  * fi, fullwidth Ａ → A, superscript ² → 2, ideographic space →
  * space, …). Spark ships no normalizer function; a Scala UDF would
  * break the codegen span on the hottest map-only stage, so this is
  * the (b)-tier custom-Expression path: one JDK `java.text.Normalizer`
  * call inside generated code, NULL-safe, no boxing beyond the
  * String round-trip the JDK API forces.
  *
  * The ASCII fast path matters at corpus scale: NFKC over a clean
  * ASCII page is the common case, and `isNormalized` (a table lookup
  * per char, no allocation) skips the full decompose+recompose for
  * it.
  */
object NfkcNormalizeUtil {
  def normalize(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFKC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC))
  }
}

/** `nfkc_normalize(text)` — NULL in, NULL out. */
case class NfkcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfkc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    NfkcNormalizeUtil.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfkcNormalizeUtil.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfkcNormalizeExpr {
  def column(c: Column): Column =
    graft.GraftFunctions.columnOf("nfkc_normalize",
      exprs => NfkcNormalizeExpr(exprs(0)), c)
}
