package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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

/** `tres_extract(tres_string, field)`. The field must be a foldable
  * string (it parameterizes the generated code); a non-literal second
  * argument fails analysis instead of silently evaluating against an
  * empty row (round-1 hazard: the old UnaryExpression hid `fieldExpr`
  * from Catalyst entirely). */
case class TresExtractExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "tres_extract"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${left.dataType.catalogString}")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string field name, got ${right.dataType.catalogString}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal (foldable) field name")
    else TypeCheckResult.TypeCheckSuccess
  }

  // safe: checkInputDataTypes enforces foldable before execution
  private lazy val field: UTF8String =
    right.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[UTF8String]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    if (field == null) return null
    val v = left.eval(input)
    if (v == null) null
    else TresExtractUtil.extract(v.asInstanceOf[UTF8String], field)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    if (field == null) {
      return ev.copy(code =
        code"""
           |boolean ${ev.isNull} = true;
           |UTF8String ${ev.value} = null;
         """.stripMargin)
    }
    val fieldRef = ctx.addReferenceObj("tresField", field,
      classOf[UTF8String].getName)
    val childGen = left.genCode(ctx)
    val tmp = ctx.freshName("tresVal")
    ev.copy(code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = true;
         |UTF8String ${ev.value} = null;
         |if (!${childGen.isNull}) {
         |  UTF8String $tmp = graft.functions.TresExtractUtil.extract(${childGen.value}, $fieldRef);
         |  if ($tmp != null) { ${ev.isNull} = false; ${ev.value} = $tmp; }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object TresExtractExpr {
  def column(c: Column, field: String): Column =
    graft.GraftFunctions.columnOf("tres_extract",
      exprs => TresExtractExpr(exprs(0), exprs(1)),
      c, org.apache.spark.sql.functions.lit(field))
}
