package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization (the WordPiece /
  * BERT-vocab apply step — the real "token count" a training budget is
  * denominated in, where [[graft.operators.TextOps.tokens]] is the
  * whitespace approximation): each whitespace word is decomposed into
  * the longest vocab pieces left to right, continuations carrying the
  * `##` prefix; a word with no decomposition becomes `[UNK]`.
  *
  * The vocab is a driver-side literal embedded as a codegen reference
  * object — the standard tokenizer deployment shape (30–100k pieces,
  * ~1 MB: broadcast-bounded at any corpus size, like the d70
  * classifier model; a vocab JOIN would shuffle the corpus per word).
  * Map-only, inside whole-stage codegen; cost O(len · maxPieceLen)
  * per row via a per-piece-length hash probe, no allocation beyond
  * the output pieces.
  *
  * Greedy longest-match is sequential by definition, so there is no
  * SQL replay — the gate hashes an in-plan verdict (full coverage
  * roundtrip, single-piece vocab words, exact oracle-computable word
  * totals; the d75 pattern) and the piece-level surface is spec-pinned
  * on hand-computed decompositions. */
final class WordPieceVocab(val pieces: Seq[String]) extends Serializable {
  @transient private lazy val starts: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    pieces.foreach(p => if (!p.startsWith("##")) s.add(p))
    s
  }
  @transient private lazy val conts: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    pieces.foreach(p => if (p.startsWith("##")) s.add(p.substring(2)))
    s
  }
  @transient private lazy val maxStart: Int =
    pieces.iterator.filterNot(_.startsWith("##")).map(_.length)
      .foldLeft(0)(math.max)
  @transient private lazy val maxCont: Int =
    pieces.iterator.filter(_.startsWith("##")).map(_.length - 2)
      .foldLeft(0)(math.max)

  val UNK = "[UNK]"

  /** Decompose one word; appends pieces (or [UNK]) to `out`. */
  private def encodeWord(w: String, out: java.util.ArrayList[UTF8String]): Unit = {
    val n = w.length
    val mark = out.size()
    var pos = 0
    while (pos < n) {
      val isStart = pos == 0
      val set = if (isStart) starts else conts
      var l = math.min(n - pos, if (isStart) maxStart else maxCont)
      var found: String = null
      while (l >= 1 && found == null) {
        val cand = w.substring(pos, pos + l)
        if (set.contains(cand)) found = cand
        l -= 1
      }
      if (found == null) {
        // no piece fits → the WHOLE word is unknown (BERT semantics)
        while (out.size() > mark) out.remove(out.size() - 1)
        out.add(UTF8String.fromString(UNK))
        return
      }
      out.add(UTF8String.fromString(if (isStart) found else "##" + found))
      pos += found.length
    }
  }

  /** Encode a whole text: whitespace-split (the [[TextOps.tokens]]
    * rule; lowercasing is the caller's), pieces of all words in
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
      if (i > start) encodeWord(str.substring(start, i), out)
    }
    new GenericArrayData(out.toArray())
  }
}

case class WordPieceEncodeExpr(child: Expression, vocab: WordPieceVocab)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wordpiece_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    vocab.encodeText(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceVocab", vocab,
      classOf[WordPieceVocab].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeText($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordPieceEncodeExpr {
  def column(text: Column, vocab: WordPieceVocab): Column =
    graft.GraftFunctions.columnOf("wordpiece_encode",
      exprs => WordPieceEncodeExpr(exprs.head, vocab), text)
}
