package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bigram-LM scoring fold as ONE hashed pass over the token array —
  * the r16 replacement for the `aggregate(zipNgrams(...))` fold over
  * `try_element_at(typedLit(model), ...)` literal-map lookups the
  * streaming scorer shipped with.
  *
  * Why: a Catalyst map literal is `ArrayBasedMapData` — two parallel
  * arrays with NO hash index, so every `element_at` probe is a LINEAR
  * SCAN of the key array. With the d158 gate's corpus-trained model
  * (10⁴–10⁵ bigram entries) each scored bigram paid an O(|model|)
  * walk: the gate's single micro-batch spent ~2 s inside `addBatch`
  * scoring 5 000 docs. This expression carries the SAME model as a
  * codegen reference object (the WordPiece/Aho–Corasick/d70 shape)
  * with real `java.util.HashMap` probes — O(1) per bigram — keyed by
  * `UTF8String`, so tokens never convert to `java.lang.String` on the
  * hot path.
  *
  * Semantics are bit-identical to the fold it replaces (spec-pinned by
  * StreamingSpec's stream==batch test): per consecutive token pair,
  * score = bigram hit, else w₁-context hit, else `default`; the sum
  * accumulates in token order as a long; n = #pairs. Output:
  * struct(s BIGINT, n BIGINT). */
final class BigramLmModel(bg: Map[String, Long], w1: Map[String, Long],
                          val default: Long) extends Serializable {
  @transient private lazy val bgMap: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](bg.size * 2)
    bg.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }
  @transient private lazy val w1Map: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](w1.size * 2)
    w1.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }
  @transient private lazy val space: UTF8String = UTF8String.fromString(" ")

  /** (lm_sum, n_bigrams) over the token array, the fold's exact rule. */
  def score(toks: ArrayData): InternalRow = {
    val n = toks.numElements()
    var s = 0L
    var i = 0
    while (i < n - 1) {
      val a = toks.getUTF8String(i)
      val b = toks.getUTF8String(i + 1)
      val hit = bgMap.get(UTF8String.concat(a, space, b))
      s += (if (hit != null) hit.longValue
            else {
              val h1 = w1Map.get(a)
              if (h1 != null) h1.longValue else default
            })
      i += 1
    }
    new GenericInternalRow(Array[Any](s, math.max(n - 1, 0).toLong))
  }
}

case class BigramLmScoreExpr(child: Expression, model: BigramLmModel)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("s", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))
  override def prettyName: String = "bigram_lm_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(toks: Any): Any =
    model.score(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramLmModel", model,
      classOf[BigramLmModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.score($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramLmScoreExpr {
  def column(toks: Column, model: BigramLmModel): Column =
    graft.GraftFunctions.columnOf("bigram_lm_score",
      exprs => BigramLmScoreExpr(exprs.head, model), toks)
}
