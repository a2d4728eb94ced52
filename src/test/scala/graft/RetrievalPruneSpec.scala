package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Retrieval

/** The WAND/df-cutoff pin (the r12 verdict's task 10): candidate
  * pruning must be a CANDIDATE-SET rule only — top-k lists, ranks AND
  * scores bit-identical to the classic probe on the gate corpus, for
  * both the d60 (scan) and d66 (materialized index) shapes, at the
  * default half-corpus cutoff and a tighter quarter-corpus one. */
class RetrievalPruneSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("q_id", "rank").collect().map(_.toString).toSeq

  test("df-cutoff pruning is top-k/score-identical to the classic probe (d60 shape)") {
    val d = Tables.load(spark, dir, "documents", spread = true)
    val qs = d.filter(col("doc_id") % 97 === 0)
    val classic = rows(Retrieval.bm25TopK(d, col("text"), col("doc_id"),
      qs, col("text"), col("doc_id"), k = 10))
    assert(classic.nonEmpty)
    for ((num, den) <- Seq((1L, 2L), (1L, 4L))) {
      val pruned = rows(Retrieval.bm25TopKPruned(d, col("text"), col("doc_id"),
        qs, col("text"), col("doc_id"), k = 10, fracNum = num, fracDen = den))
      assert(pruned == classic, s"cutoff $num/$den diverged from the classic probe")
    }
  }

  test("df-cutoff pruning is identical over the materialized index (d66 shape)") {
    val d = Tables.load(spark, dir, "documents", spread = true)
    val post = Retrieval.postings(d, col("text"), col("doc_id"))
    val qs = d.filter(col("doc_id") % 97 === 0)
    val classic = rows(Retrieval.bm25FromIndex(post, qs,
      col("text"), col("doc_id"), k = 10))
    val pruned = rows(Retrieval.bm25FromIndexPruned(post, qs,
      col("text"), col("doc_id"), k = 10))
    assert(pruned == classic && classic.nonEmpty)
  }

  test("the all-stopword-query fallback keeps full term sets") {
    import spark.implicits._
    // 6 docs sharing one ubiquitous token; the query is ONLY that
    // token → no selective term → fallback must still retrieve
    val corpus = (0L until 6L).map(i => (i, s"common extra$i word$i"))
      .toDF("doc_id", "text")
    val q = Seq((100L, "common")).toDF("doc_id", "text")
    val classic = rows(Retrieval.bm25TopK(corpus, col("text"), col("doc_id"),
      q, col("text"), col("doc_id"), k = 3))
    val pruned = rows(Retrieval.bm25TopKPruned(corpus, col("text"), col("doc_id"),
      q, col("text"), col("doc_id"), k = 3))
    assert(pruned == classic && classic.nonEmpty)
  }
}
