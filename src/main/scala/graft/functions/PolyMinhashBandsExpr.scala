package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `poly_minhash_bands(text)` — the complete per-row minhash banding
  * (token hashes → 3-shingle hashes → all `bands·rows` permutation mins
  * → base-131 band hashes) fused into ONE pass over the tokens.
  *
  * The composed Column form (`Dedup.polyRowBandsComposed`) inlines the
  * full shingle pipeline once per permutation — 16× the string work,
  * plus an intermediate array per step — and its expression tree is
  * large enough to stall codegen; measured >100 s for a 5 k-doc corpus
  * where this loop takes well under a second. Semantics are pinned
  * equal to both the composed form and the aggregated signature path of
  * [[graft.operators.Dedup.polyMinhashPairs]] by OperatorsSpec: min
  * over the shingle multiset equals min over the distinct set, so the
  * `array_distinct` of the composed path needs no replay here.
  *
  * Returns `array<long>` of `bands` band hashes (band index =
  * position − 1; callers `posexplode`), or null when the doc has fewer
  * than 3 tokens (no shingles — callers drop or pre-filter).
  */
object PolyBandsUtil {
  import PolyHashUtil.P

  /** Permutation coefficients shared by every oracle-exact minhash
    * path — small `a` keeps a·h < 2^51 so checked 64-bit arithmetic
    * (DuckDB) and Java longs agree. (Moved here from Dedup so the
    * codegen'd expression below can reach them statically;
    * `Dedup.polyCoefs` aliases this.) */
  val coefs: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(16)((rnd.nextInt(999999).toLong + 1L, rnd.nextInt(1000000).toLong))
  }
  private val A = coefs.map(_._1).toArray
  private val B = coefs.map(_._2).toArray

  def bandHashes(lowered: String, bands: Int, rows: Int): GenericArrayData = {
    val hs = PolyHashUtil.tokenHashes(lowered)
    val n = hs.numElements()
    if (n < 3) return null
    val k = bands * rows
    val mins = Array.fill(k)(P) // shingle perms are < P, so P = +inf
    var i = 0
    while (i + 2 < n) {
      val h = ((hs.getLong(i) * 131 + hs.getLong(i + 1)) % P * 131 +
        hs.getLong(i + 2)) % P
      var j = 0
      while (j < k) {
        val v = (A(j) * h + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](bands)
    var bi = 0
    while (bi < bands) {
      var acc = mins(bi * rows)
      var r = 1
      while (r < rows) { acc = (acc * 131 + mins(bi * rows + r)) % P; r += 1 }
      out(bi) = acc
      bi += 1
    }
    new GenericArrayData(out)
  }
}

case class PolyMinhashBandsExpr(child: Expression, bands: Int, rows: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "poly_minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.catalogString}")
    else if (bands * rows > PolyBandsUtil.coefs.length)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports at most ${PolyBandsUtil.coefs.length} permutations")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(s: Any): Any =
    PolyBandsUtil.bandHashes(
      s.asInstanceOf[UTF8String].toLowerCase.toString, bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PolyBandsUtil.bandHashes(
        $c.toLowerCase().toString(), $bands, $rows);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyMinhashBandsExpr {
  def column(text: Column, bands: Int = 4, rows: Int = 4): Column =
    graft.GraftFunctions.columnOf("poly_minhash_bands",
      exprs => PolyMinhashBandsExpr(exprs.head, bands, rows), text)
}
