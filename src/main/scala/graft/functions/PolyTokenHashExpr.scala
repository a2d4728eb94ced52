package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `poly_token_hashes(text)` — per-token polynomial hashes
  * (`fold (acc*31 + codepoint) mod 2³¹−1` per whitespace token of
  * `lower(text)`), fused into one pass.
  *
  * This is the hot loop of every oracle-exact dedup operator (d23
  * fingerprint per token, d24/d27/d34 minhash chain, d39 substring
  * spans). The composed Column form —
  * `transform(split(lower(text),'\\s+'), w -> aggregate(split(w,''),
  * 0L, ...))` — allocates an ARRAY PER CHARACTER and walks the
  * higher-order-function machinery per element; this expression is a
  * single regex split + primitive char loop per token. Semantics are
  * pinned equal to the composed form by PolyTokenHashSpec: same
  * Java-regex `\s+` split (leading/trailing empty tokens included,
  * empty token hashes to 0), same UTF8String lowercasing, same
  * code-point values (= Spark `ascii` on each split character).
  */
object PolyHashUtil {
  val P = 2147483647L // 2^31 − 1; acc*31 + cp stays < 2^62
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def tokenHashes(lowered: String): GenericArrayData = {
    val toks = WS.split(lowered, -1)
    val out = new Array[Any](toks.length)
    var t = 0
    while (t < toks.length) {
      val w = toks(t)
      var acc = 0L
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        acc = (acc * 31 + cp) % P
        i += Character.charCount(cp)
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }
}

case class PolyTokenHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_token_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    PolyHashUtil.tokenHashes(s.asInstanceOf[UTF8String].toLowerCase.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHashUtil.tokenHashes($c.toLowerCase().toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyTokenHashExpr {
  def column(text: Column): Column =
    graft.GraftFunctions.columnOf("poly_token_hashes",
      exprs => PolyTokenHashExpr(exprs.head), text)
}
