package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-phrase substring counting via an Aho–Corasick automaton — the
  * blocklist/wordlist scan of a web-curation stage (C4 drops any page
  * containing a "bad words" list entry; quality pipelines count
  * policy-phrase hits per document).
  *
  * One pass over the text counts ALL occurrences of EVERY phrase
  * simultaneously — O(len + matches) per row regardless of list size,
  * where per-phrase `contains`/`regexp` scans are O(len · |list|): at
  * a 100 TB corpus with a realistic few-thousand-entry wordlist that
  * difference is the whole budget. The automaton rides along as a
  * codegen reference object (the d70-classifier / d78-vocab deployment
  * shape — KB-to-MB scale, broadcast-bounded at any corpus size; a
  * phrase JOIN would shuffle the corpus per candidate).
  *
  * Matching is exact char-sequence (callers lowercase both sides for
  * case-insensitive semantics — `TextOps.phraseCounts` does) and
  * counts OVERLAPPING occurrences — `aa` occurs twice in `aaa`. The
  * `d80_phrase_filter` DuckDB oracle replays that rule by brute-force
  * position scan, so the gate hash covers the automaton's output
  * exactly. */
final class PhraseAutomaton(val phrases: Seq[String]) extends Serializable {
  require(phrases.nonEmpty, "phrase list must be non-empty")
  require(phrases.forall(_.nonEmpty), "phrases must be non-empty strings")

  // Built lazily per JVM (driver for interpreted eval, each executor
  // once after deserialization) — the serialized form is just the
  // phrase list.
  @transient private lazy val trie: (Array[java.util.HashMap[Character, Integer]],
    Array[Int], Array[Array[Int]]) = {
    val children = ArrayBuffer(new java.util.HashMap[Character, Integer]())
    val ends = ArrayBuffer(ArrayBuffer.empty[Int])
    phrases.zipWithIndex.foreach { case (p, pid) =>
      var v = 0
      p.foreach { c =>
        val nxt = children(v).get(c)
        if (nxt == null) {
          children += new java.util.HashMap[Character, Integer]()
          ends += ArrayBuffer.empty[Int]
          children(v).put(c, children.size - 1)
          v = children.size - 1
        } else v = nxt
      }
      ends(v) += pid
    }
    val n = children.size
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    val queue = new java.util.ArrayDeque[Int]()
    out(0) = ends(0).toArray
    children(0).forEach { (_, v) => fail(v) = 0; queue.add(v) }
    while (!queue.isEmpty) {
      val v = queue.poll()
      // output(v) = phrases ending here ∪ output(fail(v)): suffix
      // matches surface without walking the fail chain at scan time
      out(v) = (ends(v) ++ out(fail(v))).toArray
      children(v).forEach { (c, u) =>
        var f = fail(v)
        while (f != 0 && !children(f).containsKey(c)) f = fail(f)
        val t = children(f).get(c)
        fail(u) = if (t != null && t != u) t.intValue() else 0
        queue.add(u)
      }
    }
    (children.toArray, fail, out)
  }

  /** Per-phrase occurrence counts (overlapping included) of every
    * phrase in `s`, as a LongType array aligned with `phrases`. */
  def phraseCounts(s: UTF8String): ArrayData = {
    val (children, fail, out) = trie
    val str = s.toString
    val counts = new Array[Long](phrases.length)
    var state = 0
    var i = 0
    val n = str.length
    while (i < n) {
      val c = str.charAt(i)
      var v = state
      var nxt = children(v).get(c)
      while (nxt == null && v != 0) { v = fail(v); nxt = children(v).get(c) }
      state = if (nxt == null) 0 else nxt.intValue()
      val o = out(state)
      var j = 0
      while (j < o.length) { counts(o(j)) += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

case class PhraseCountsExpr(child: Expression, automaton: PhraseAutomaton)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "phrase_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(s: Any): Any =
    automaton.phraseCounts(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseAutomaton", automaton,
      classOf[PhraseAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.phraseCounts($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PhraseCountsExpr {
  def column(text: Column, automaton: PhraseAutomaton): Column =
    graft.GraftFunctions.columnOf("phrase_counts",
      exprs => PhraseCountsExpr(exprs.head, automaton), text)
}
