package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Hashed-feature classifier weight fold — the r16 sibling of
  * [[BigramLmScoreExpr]] for d70's streaming scorer: the
  * `aggregate(feats, 0L, acc + try_element_at(typedLit(weights), f))`
  * fold probed a Catalyst map literal (no hash index → O(|model|)
  * linear scan per feature, up to the 2¹⁶ bucket bound). The weights
  * ride here as a codegen reference object with an O(1) primitive-key
  * HashMap probe; unseen features score the smoothing `prior`, and
  * the sum accumulates in feature order as a long — bit-identical to
  * the fold it replaces (StreamingSpec pins the trained-weight
  * reproduction). */
final class ClassifierWeights(weights: Map[Long, Long], val prior: Long)
    extends Serializable {
  @transient private lazy val m: java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val h = new java.util.HashMap[java.lang.Long, java.lang.Long](weights.size * 2)
    weights.foreach { case (k, v) => h.put(k, v) }
    h
  }

  def score(feats: ArrayData): Long = {
    val n = feats.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val hit = m.get(feats.getLong(i))
      s += (if (hit != null) hit.longValue else prior)
      i += 1
    }
    s
  }
}

case class ClassifierScoreExpr(child: Expression, model: ClassifierWeights)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "classifier_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(feats: Any): Any =
    model.score(feats.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("classifierWeights", model,
      classOf[ClassifierWeights].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.score($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ClassifierScoreExpr {
  def column(feats: Column, model: ClassifierWeights): Column =
    graft.GraftFunctions.columnOf("classifier_score",
      exprs => ClassifierScoreExpr(exprs.head, model), feats)
}
