package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** `jaccard_sim(a, b)` over two string arrays — the near-dup
  * verification hot loop.
  *
  * The composed form `size(array_intersect(a,b)) /
  * size(array_union(a,b))` materializes TWO result arrays per pair
  * (the intersection and the union, each with its own hash set and
  * copied elements) only to take their lengths and throw them away —
  * at 5.8 M verified candidate pairs in the 50× rehearsal that is
  * gigabytes of garbage. This expression computes both DISTINCT
  * counts in one two-set pass and allocates nothing but the sets.
  *
  * Semantics are exactly the composed form's: distinct-element
  * intersection over union (array_intersect/array_union are
  * distinct-producing), a NULL element counts as one distinct value
  * on each side, and a 0-sized union yields NULL the same way
  * Spark's Divide does on a zero divisor. JaccardSimSpec pins
  * equality against the composed form on arbitrary arrays. */
object JaccardSimUtil {
  /** Boxed: null on an empty union (the composed form's 0/0 → NULL). */
  def jaccard(a: ArrayData, b: ArrayData): java.lang.Double = {
    val setA = new java.util.HashSet[Any]()
    var aNull = false
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) aNull = true
      else setA.add(a.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[Any]()
    var bNull = false
    var inter = 0L
    var bExtra = 0L
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (b.isNullAt(i)) bNull = true
      else {
        val s = b.getUTF8String(i)
        if (seenB.add(s)) {
          if (setA.contains(s)) inter += 1L else bExtra += 1L
        }
      }
      i += 1
    }
    val interT = inter + (if (aNull && bNull) 1L else 0L)
    val uni = setA.size.toLong + (if (aNull) 1L else 0L) + bExtra +
      (if (bNull && !aNull) 1L else 0L)
    if (uni == 0L) null else java.lang.Double.valueOf(interT.toDouble / uni)
  }
}

case class JaccardSimExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_sim"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!ok(left.dataType) || !ok(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSimUtil.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("jac")
      s"""
         |java.lang.Double $r = graft.functions.JaccardSimUtil.jaccard($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardSimExpr {
  def column(a: Column, b: Column): Column =
    graft.GraftFunctions.columnOf("jaccard_sim",
      exprs => JaccardSimExpr(exprs(0), exprs(1)), a, b)
}
