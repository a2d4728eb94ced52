package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass `field=value` extraction from TRES-style strings
  * (`billing=12,cpu=4,mem=2048M,gres/gpu=2`), replacing the composed
  * `regexp_extract("\bfield=([^,]*)")` on the ingest hot path — same
  * semantics (word-boundary before the field name, value runs to the
  * next comma, first match wins, empty → NULL), pinned by
  * TresExtractSpec against the regex form.
  */
object TresExtractUtil {
  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Returns the value for `field`, or null (no match / empty value). */
  def extract(u: UTF8String, field: UTF8String): UTF8String = {
    if (u == null) return null
    val s = u.toString
    val f = field.toString + "="
    var from = 0
    while (from <= s.length - f.length) {
      val i = s.indexOf(f, from)
      if (i < 0) return null
      // \b before the field: start-of-string or previous char non-word
      // (when the field starts with a word char — mirrors java.util.regex)
      val boundary =
        if (f.isEmpty || !isWordChar(f.charAt(0))) true
        else i == 0 || !isWordChar(s.charAt(i - 1))
      if (boundary) {
        val start = i + f.length
        var end = s.indexOf(',', start)
        if (end < 0) end = s.length
        val v = s.substring(start, end).trim
        return if (v.isEmpty) null else UTF8String.fromString(v)
      }
      from = i + 1
    }
    null
  }
}

case class TresExtractExpr(child: Expression, fieldExpr: Expression)
  extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "tres_extract"

  private lazy val field: UTF8String =
    fieldExpr.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[UTF8String]

  override def nullSafeEval(v: Any): Any =
    TresExtractUtil.extract(v.asInstanceOf[UTF8String], field)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fieldRef = ctx.addReferenceObj("tresField", field,
      classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("tresVal")
      s"""
         |UTF8String $tmp = graft.functions.TresExtractUtil.extract($c, $fieldRef);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TresExtractExpr {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.call_function

  def column(c: Column, field: String): Column = {
    val spark = SparkSession.active
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tres_extract", exprs => TresExtractExpr(exprs(0), exprs(1)), "built-in")
    call_function("tres_extract", c, org.apache.spark.sql.functions.lit(field))
  }
}
