package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BigramLmModel, BigramLmScoreExpr}

/** Pins the r16 hashed bigram-LM scorer ([[BigramLmScoreExpr]] — the
  * codegen reference-object replacement for the O(|model|)-per-probe
  * `try_element_at(typedLit(...))` fold) to the fold's exact rule on
  * every path: bigram hit, w₁-context backoff, default backoff, sum
  * order, pair count, and the degenerate inputs the stream filter
  * normally removes (0/1 tokens). The end-to-end stream==batch
  * bit-identity stays pinned in StreamingSpec. */
class BigramLmExprSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val model = new BigramLmModel(
    bg = Map("a b" -> 5L, "b a" -> 11L),
    w1 = Map("a" -> 2L, "z" -> -3L),
    default = -7L)

  private def score(toks: Seq[String]): (Long, Long) = {
    val r = Seq(Tuple1(toks)).toDF("t")
      .select(BigramLmScoreExpr.column(col("t"), model).as("a"))
      .select(col("a.s"), col("a.n")).head
    (r.getLong(0), r.getLong(1))
  }

  test("bigram hit, w1 backoff, default backoff, in order") {
    // pairs: (a,b)→bg 5; (b,c)→w1("b") absent→default -7; (c,z)→-7
    assert(score(Seq("a", "b", "c", "z")) === ((5L - 7L - 7L, 3L)))
    // w1 backoff fires when the bigram misses but the context is known:
    // (a,x)→w1("a")=2; (x,a)→default; (a,b)→bg 5
    assert(score(Seq("a", "x", "a", "b")) === ((2L - 7L + 5L, 3L)))
    // every pair unknown, leading token unknown: all defaults
    assert(score(Seq("q", "r", "s")) === ((-14L, 2L)))
  }

  test("degenerate inputs: one token and empty array score (0, 0)") {
    assert(score(Seq("a")) === ((0L, 0L)))
    assert(score(Seq.empty[String]) === ((0L, 0L)))
  }

  test("null array yields null struct (UnaryExpression contract)") {
    val r = Seq(Tuple1(null: Seq[String])).toDF("t")
      .select(BigramLmScoreExpr.column(col("t"), model).as("a")).head
    assert(r.isNullAt(0))
  }

  test("matches the composed try_element_at fold on corpus text") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val (bg, w1, dflt) = graft.operators.TextOps.bigramLmModel(
      docs.filter(col("lang") === "en"), col("text"))
    val m = new BigramLmModel(bg, w1, dflt)
    val toks = graft.operators.TextOps.tokens(col("text"))
    def mapLit(mm: Map[String, Long]) =
      typedLit(if (mm.nonEmpty) mm else Map("  " -> 0L))
    val composed = docs.filter(size(toks) >= 2).select(col("doc_id"),
      aggregate(graft.operators.Dedup.zipNgrams(toks, 2,
        (a, b) => struct(a.as("w1"), concat(a, lit(" "), b).as("bg"))),
        struct(lit(0L).as("s"), lit(0L).as("n")),
        (acc, p) => struct(
          (acc.getField("s") + coalesce(
            try_element_at(mapLit(bg), p.getField("bg")),
            try_element_at(mapLit(w1), p.getField("w1")),
            lit(dflt))).as("s"),
          (acc.getField("n") + 1L).as("n"))).as("a"))
      .select(col("doc_id"), col("a.s"), col("a.n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val native = docs.filter(size(toks) >= 2).select(col("doc_id"),
        BigramLmScoreExpr.column(toks, m).as("a"))
      .select(col("doc_id"), col("a.s"), col("a.n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(native.nonEmpty && native === composed)
  }
}
