package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass parser for `[dd-[hh:]]mm:ss` (NaN-sentinel helper shared
  * by interpreted eval and generated code). Semantics bit-identical to
  * [[SlurmFunctions.slurmTime]]'s composed form — pinned by
  * SlurmTimeParseSpec over the whole synthetic corpus. */
object SlurmTimeUtil {
  /** Returns seconds, or NaN for NULL-semantics inputs (empty,
    * UNLIMITED, Partition_Limit, malformed). */
  def parseOrNaN(u: UTF8String): Double = {
    if (u == null) return Double.NaN
    val s = u.toString.trim
    if (s.isEmpty || s == "UNLIMITED" || s == "Partition_Limit") return Double.NaN
    try {
      val dash = s.indexOf('-')
      if (dash >= 0) {
        // dd-hh[:mm[:ss]] — anchored from the left; like the composed
        // form, only the segment between the first two dashes counts
        val parts = s.split("-", -1)
        val days = java.lang.Long.parseLong(parts(0))
        val hms = parts(1).split(":", -1)
        var secs = days * 86400L.toDouble
        if (hms.length >= 1) secs += 3600 * java.lang.Double.parseDouble(hms(0))
        if (hms.length >= 2) secs += 60 * java.lang.Double.parseDouble(hms(1))
        if (hms.length >= 3) secs += java.lang.Double.parseDouble(hms(2))
        secs
      } else {
        // [hh:]mm:ss — anchored from the right; bare number = minutes
        val hms = s.split(":", -1)
        val n = hms.length
        if (n == 1) 60 * java.lang.Double.parseDouble(hms(0))
        else {
          var secs = java.lang.Double.parseDouble(hms(n - 1)) +
            60 * java.lang.Double.parseDouble(hms(n - 2))
          if (n >= 3) secs += 3600 * java.lang.Double.parseDouble(hms(n - 3))
          secs
        }
      }
    } catch {
      case _: NumberFormatException => Double.NaN
    }
  }
}

/** Native Catalyst expression for the Slurm time spec: one pass over the
  * string inside whole-stage codegen, replacing the composed form's
  * three `split`s + arithmetic tree. Used on the ingest hot path
  * (SlurmTable parses up to six time columns per row). */
case class SlurmTimeParse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "slurm_time"

  override def nullSafeEval(v: Any): Any = {
    val r = SlurmTimeUtil.parseOrNaN(v.asInstanceOf[UTF8String])
    if (java.lang.Double.isNaN(r)) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("slurmTime")
      s"""
         |double $tmp = graft.functions.SlurmTimeUtil.parseOrNaN($c);
         |if (Double.isNaN($tmp)) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SlurmTimeParse {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.call_function

  /** Expose as a Column — session-independent (works in any session
    * without registration; see GraftFunctions.columnOf). SQL users call
    * `slurm_time(...)` after `GraftFunctions.register(spark)`. */
  def column(c: Column): Column =
    graft.GraftFunctions.columnOf("slurm_time",
      exprs => SlurmTimeParse(exprs.head), c)
}
