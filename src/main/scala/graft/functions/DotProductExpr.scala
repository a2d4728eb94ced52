package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `dot_product(a, b)` over two double arrays — the ANN hot loop.
  *
  * The composed form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * materializes an intermediate array per pair and walks it through
  * the generic higher-order-function machinery; at brute-force-ANN
  * scale that is an allocation and two passes per (query, candidate)
  * pair. This expression is one fused primitive loop, no intermediate,
  * codegen'd. Semantics pinned by DotProductSpec against the composed
  * form: NULL on length mismatch or any NULL element (exactly what
  * zip_with + aggregate produce), summation order left-to-right (same
  * as both the composed form and DuckDB's list_dot_product, so oracle
  * float parity is preserved).
  */
object DotProductUtil {
  /** Returns null (boxed) on length mismatch / null element. */
  def dot(x: ArrayData, y: ArrayData): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!ok(left.dataType) || !ok(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  def column(a: Column, b: Column): Column =
    graft.GraftFunctions.columnOf("dot_product",
      exprs => DotProductExpr(exprs(0), exprs(1)), a, b)
}
