package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{WordPieceEncodeExpr, WordPieceVocab}
import graft.operators.TextOps

/** WordPiece greedy longest-match: hand-computed decompositions, the
  * greedy (no-backtrack) rule, whole-word [UNK] semantics, and the
  * roundtrip guarantee under a full-alphabet vocab. */
class WordPieceSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def enc(vocab: WordPieceVocab, texts: String*): Seq[Seq[String]] =
    texts.toDF("t").select(WordPieceEncodeExpr.column(col("t"), vocab).as("p"))
      .as[Seq[String]].collect().toSeq

  private val letters =
    ('a' to 'z').map(_.toString) ++ ('a' to 'z').map(c => s"##$c")

  test("hand-computed decompositions: whole word, stem+suffix, chains") {
    val v = new WordPieceVocab(letters ++ Seq("scan", "##ner", "##s", "fast"))
    assert(enc(v, "scan") == Seq(Seq("scan")))
    assert(enc(v, "scanner") == Seq(Seq("scan", "##ner")))
    assert(enc(v, "scanners") == Seq(Seq("scan", "##ner", "##s")))
    assert(enc(v, "fast scan") == Seq(Seq("fast", "scan")))
  }

  test("greedy longest-match takes the longest piece, never backtracks") {
    // "abc" available → greedy eats it and continues with ##d
    val v1 = new WordPieceVocab(Seq("ab", "abc", "##d", "##cd", "a", "##b", "##c"))
    assert(enc(v1, "abcd") == Seq(Seq("abc", "##d")))
    // no "abc" → falls to "ab" + "##cd"
    val v2 = new WordPieceVocab(Seq("ab", "##cd", "a", "##b", "##c", "##d"))
    assert(enc(v2, "abcd") == Seq(Seq("ab", "##cd")))
    // greedy is NOT optimal: eating "abc" strands "x" when only ##dx
    // completes — the whole word goes [UNK] rather than backtracking
    val v3 = new WordPieceVocab(Seq("abc", "ab", "##cdx"))
    assert(enc(v3, "abcdx") == Seq(Seq("[UNK]")))
  }

  test("undecomposable words become a single [UNK], not partial pieces") {
    val v = new WordPieceVocab(Seq("scan", "##ner"))
    assert(enc(v, "scanq") == Seq(Seq("[UNK]")))
    assert(enc(v, "qscan") == Seq(Seq("[UNK]")))
    // neighbors are unaffected
    assert(enc(v, "scan qqq scanner") ==
      Seq(Seq("scan", "[UNK]", "scan", "##ner")))
  }

  test("whitespace handling: runs, leading/trailing, empty text") {
    val v = new WordPieceVocab(letters)
    assert(enc(v, "  a   b ") == Seq(Seq("a", "b")))
    assert(enc(v, "") == Seq(Seq()))
    assert(enc(v, "   ") == Seq(Seq()))
  }

  test("full-alphabet vocab: exact roundtrip on the real corpus, no [UNK]") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val v = new WordPieceVocab(letters ++ Seq("the", "scan", "##an"))
    val p = TextOps.subwordTokens(col("text"), v)
    val bad = docs.select(
        (regexp_replace(array_join(p, ""), "##", "") ===
          regexp_replace(col("text"), "\\s+", "")).as("rt"),
        array_contains(p, "[UNK]").as("unk"))
      .filter(!col("rt") || col("unk"))
    assert(bad.count() == 0)
  }

  test("piece count sits between word count and char count; vocab words stay whole") {
    val v = new WordPieceVocab(letters ++ Seq("table", "value"))
    val df = Seq("table value x", "value table").toDF("t")
      .select(WordPieceEncodeExpr.column(col("t"), v).as("p"), col("t"))
    val rows = df.select(size(col("p")), col("p")).collect()
    assert(rows(0).getInt(0) == 3 && rows(1).getInt(0) == 2)
    assert(rows(0).getSeq[String](1) == Seq("table", "value", "x"))
  }
}
