package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SentencePiece-style UNIGRAM-LM tokenizer model (Kudo 2018) — the
  * third production tokenizer family next to BPE
  * ([[graft.operators.TextOps.bpeTrain]]/bpeEncode) and WordPiece
  * ([[WordPieceEncodeExpr]]): each word is segmented by VITERBI into
  * the piece sequence maximizing the sum of piece log-probabilities
  * under a unigram language model over the piece vocabulary.
  *
  * Log-probabilities are QUANTIZED to exact integers so the model is
  * bit-identical across engines, partitionings and runs (the repo's
  * engine-exactness rule — float `ln` differs in ULPs between JVMs
  * and SQL engines and a Viterbi argmax amplifies a ULP into a
  * different segmentation): score(p) = ⌊3·log₂ cnt(p)⌋ − ⌊3·log₂ T⌋
  * where T = Σ cnt — both terms are bit lengths of integer CUBES
  * (bitLength(c³) − 1 = ⌊log₂ c³⌋ = ⌊3·log₂ c⌋, pure integer
  * arithmetic; DuckDB replays it as `length(bin(c*c*c)) - 1` on
  * HUGEINT), giving ⅓-bit log resolution. Quantization ties are
  * broken deterministically: fewer pieces first, then longer last
  * piece — the same total order the SQL oracle's
  * `row_number() OVER (ORDER BY val DESC, np ASC, ll DESC)` replays.
  *
  * A word containing a character outside the vocabulary (impossible
  * on the training corpus — single characters are never pruned)
  * encodes as the single piece `<unk>`, SentencePiece's behavior.
  *
  * The model is a driver-side literal embedded as a codegen reference
  * object — the [[WordPieceVocab]] deployment shape (a tokenizer
  * vocab is KB–MB: plan-shippable at any corpus size; a vocab JOIN
  * would shuffle the corpus per word). Map-only, stays inside
  * whole-stage codegen; cost O(len · maxPieceLen) hash probes per
  * word plus the O(len) backtrack. */
final class UnigramModel(val pieces: Seq[(String, Long)]) extends Serializable {

  // value type must be the BOXED Long: with a primitive value type
  // scala would unbox get()'s null-for-missing into 0 — and 0 beats
  // every real (negative) log-prob, silently scoring UNSEEN pieces
  // best of all
  @transient private lazy val score: java.util.HashMap[String, java.lang.Long] = {
    val t = UnigramModel.ilog3(pieces.iterator.map(_._2).sum)
    val m = new java.util.HashMap[String, java.lang.Long]()
    pieces.foreach { case (p, c) => m.put(p, UnigramModel.ilog3(c) - t) }
    m
  }
  @transient private lazy val maxPieceLen: Int =
    pieces.iterator.map(_._1.length).foldLeft(1)(math.max)

  val UNK = "<unk>"

  /** Viterbi-best piece sequence for one word (no whitespace), or
    * the single UNK piece if some position is uncoverable. */
  def segmentWord(w: String): Array[String] = {
    val n = w.length
    if (n == 0) return Array.empty
    // best state per prefix length j: quantized LM value, piece
    // count, last-piece length; ll(j) == 0 marks unreachable
    val value = new Array[Long](n + 1)
    val np = new Array[Int](n + 1)
    val ll = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var bestV = 0L; var bestN = 0; var bestL = 0
      var l = 1
      val lMax = math.min(maxPieceLen, j)
      while (l <= lMax) {
        if (j - l == 0 || ll(j - l) > 0) {
          val sc = score.get(w.substring(j - l, j))
          if (sc != null) {
            val v = value(j - l) + sc.longValue()
            val c = np(j - l) + 1
            // (val desc, pieces asc, last-len desc) — the oracle's
            // row_number ordering, bit for bit
            if (bestL == 0 || v > bestV ||
              (v == bestV && (c < bestN || (c == bestN && l > bestL)))) {
              bestV = v; bestN = c; bestL = l
            }
          }
        }
        l += 1
      }
      value(j) = bestV; np(j) = bestN; ll(j) = bestL
      j += 1
    }
    if (ll(n) == 0) return Array(UNK)
    val out = new Array[String](np(n))
    var k = np(n) - 1
    var pos = n
    while (pos > 0) {
      out(k) = w.substring(pos - ll(pos), pos)
      pos -= ll(pos); k -= 1
    }
    out
  }

  /** Encode a whole text: whitespace-split (the TextOps.tokens rule;
    * lowercasing is the caller's), Viterbi pieces of every word in
    * order. */
  def encodeText(s: UTF8String): ArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val str = s.toString
    var i = 0
    val n = str.length
    while (i < n) {
      while (i < n && Character.isWhitespace(str.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(str.charAt(i))) i += 1
      if (i > start)
        segmentWord(str.substring(start, i))
          .foreach(p => out.add(UTF8String.fromString(p)))
    }
    new GenericArrayData(out.toArray())
  }
}

object UnigramModel {
  /** ⌊3·log₂ c⌋ for c ≥ 1 as pure integer arithmetic — BigInt keeps
    * the cube exact at any corpus count (DuckDB twin: HUGEINT). */
  def ilog3(c: Long): Long = {
    require(c >= 1, s"ilog3 needs a positive count, got $c")
    (BigInt(c).pow(3).bitLength - 1).toLong
  }
}

case class UnigramEncodeExpr(child: Expression, model: UnigramModel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    model.encodeText(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramModel", model,
      classOf[UnigramModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeText($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramEncodeExpr {
  def column(text: Column, model: UnigramModel): Column =
    graft.GraftFunctions.columnOf("unigram_encode",
      exprs => UnigramEncodeExpr(exprs.head, model), text)
}
