package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{PhraseAutomaton, PhraseCountsExpr}
import graft.operators.TextOps

/** Aho–Corasick phrase matching: hand-computed counts (overlapping
  * occurrences, suffix outputs through fail transitions), the codegen
  * and interpreted paths agreeing, and the TextOps surface semantics
  * (case-insensitivity on both sides, null-text verdict). */
class PhraseMatchSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def counts(phrases: Seq[String], texts: String*): Seq[Seq[Long]] =
    texts.toDF("t")
      .select(PhraseCountsExpr.column(col("t"),
        new PhraseAutomaton(phrases)).as("c"))
      .as[Seq[Long]].collect().toSeq

  test("hand-computed counts: disjoint, repeated, and absent phrases") {
    assert(counts(Seq("cat", "dog"), "cat dog cat", "dogdogdog", "bird") ==
      Seq(Seq(2L, 1L), Seq(0L, 3L), Seq(0L, 0L)))
  }

  test("overlapping occurrences all count: 'aa' twice in 'aaa'") {
    assert(counts(Seq("aa"), "aaa") == Seq(Seq(2L)))
    assert(counts(Seq("aba"), "ababa") == Seq(Seq(2L)))
    assert(counts(Seq("batch batch"), "batch batch batch") == Seq(Seq(2L)))
  }

  test("suffix outputs: a match ending inside a longer phrase still counts") {
    // "he" ends at position 1 of "hers"; "s" is also a phrase; the
    // automaton must surface BOTH via the output links, not just the
    // longest match at each state
    assert(counts(Seq("he", "hers", "s"), "hers") == Seq(Seq(1L, 1L, 1L)))
    // classic AC set: "ushers" hits she+he+hers (fail-transition walk)
    assert(counts(Seq("he", "she", "his", "hers"), "ushers") ==
      Seq(Seq(1L, 1L, 0L, 1L)))
  }

  test("fail transitions restart matching mid-phrase, not from scratch") {
    // after "abab" fails to extend to "ababx", state falls back to the
    // "ab" prefix and "abc" still matches on the tail
    assert(counts(Seq("ababy", "abc"), "ababc") == Seq(Seq(0L, 1L)))
  }

  test("interpreted eval matches the codegen path") {
    val a = new PhraseAutomaton(Seq("he", "she", "hers", "aa"))
    for (t <- Seq("ushers she aaa", "", "hhhh", "aaaa he")) {
      val interpreted = PhraseCountsExpr(
        org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromString(t)), a)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray.toSeq
      val codegen = counts(Seq("he", "she", "hers", "aa"), t).head
      assert(interpreted == codegen, s"paths disagree on '$t'")
    }
  }

  test("TextOps.phraseCounts lowercases both text and phrases") {
    val r = Seq("The Spark BATCH").toDF("t")
      .select(TextOps.phraseCounts(col("t"), Seq("Spark", "batch", "THE")).as("c"))
      .as[Seq[Long]].collect().head
    assert(r == Seq(1L, 1L, 1L))
  }

  test("phraseFilter: null text gets an explicit zero-hit kept verdict") {
    val df = Seq((1L, Some("bad batch")), (2L, None), (3L, Some("clean")))
      .toDF("doc_id", "text")
    val r = TextOps.phraseFilter(df, col("text"), col("doc_id"), Seq("batch"))
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 0L, 0L))   // total_hits
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 0L, 0L))   // distinct_hits
    assert(r.map(_.getBoolean(3)).toSeq == Seq(false, true, true))
    assert(!r.exists(_.anyNull), "no null verdicts for null text")
  }

  test("automaton rejects empty inputs with a clear message") {
    intercept[IllegalArgumentException](new PhraseAutomaton(Seq.empty))
    intercept[IllegalArgumentException](new PhraseAutomaton(Seq("a", "")))
  }
}
