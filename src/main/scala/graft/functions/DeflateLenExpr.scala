package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_len(text)` — the DEFLATE-compressed byte length of a
  * string's UTF-8 bytes, the primitive behind the Gopher-class
  * compression-ratio quality signal: boilerplate and templated text
  * compresses far below natural prose, so
  * `ratio = deflate_len / raw_len` is a one-number redundancy score
  * that catches repetition n-gram heuristics miss (long-range
  * repeats, interleaved templates).
  *
  * Fixed settings (level 6, zlib wrapper, no dictionary, single
  * finished stream) make the output a pure function of the input
  * bytes — deterministic across runs, partitionings, and JVMs sharing
  * a zlib. It is NOT replayable in a different engine (no SQL oracle
  * speaks DEFLATE), so the gate query hashes an in-plan BOOLEAN
  * verdict (planted-boilerplate compresses harder than prose — the
  * d13/d41/d42 pattern) and the per-doc surface stays spec-pinned.
  *
  * Codegen calls the static helper directly — the expression stays
  * inside whole-stage codegen like every other graft native. Cost is
  * O(len) per row with a thread-local Deflater (allocating one per row
  * would dominate at corpus scale). */
object DeflateUtil {
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, false)
  }
  private val bufLocal = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](65536)
  }

  def deflateLen(s: UTF8String): Long = {
    val bytes = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = bufLocal.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

case class DeflateLenExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    DeflateUtil.deflateLen(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateUtil.deflateLen($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLenExpr {
  def column(text: Column): Column =
    graft.GraftFunctions.columnOf("deflate_len",
      exprs => DeflateLenExpr(exprs.head), text)
}
