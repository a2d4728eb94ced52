package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Retrieval, Similarity}

/** d155 (d90's scale plan): RRF fusion with the IVF dense arm must
  * hold its verdict floors at spec scale — the same booleans the
  * oracle pins at gate scale, plus the shape claims the single-row
  * gate output can't carry. */
class RrfIvfSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  val dir = "/root/testdata/sf0.001"

  test("IVF-armed fusion holds the recall and overlap floors; totals exact") {
    val d = Tables.load(spark, dir, "documents")
    val e = Tables.load(spark, dir, "embeddings")
    val nq = e.filter(col("vec_id") % 97 === 0).count()
    val row = Retrieval.rrfIvfVerdict(
      d, col("text"), col("doc_id"),
      d.filter(col("doc_id") % 97 === 0), col("text"), col("doc_id"),
      e, e.filter(col("vec_id") % 97 === 0), k = 10).head()
    assert(row.getLong(0) == nq * 10, "n_bf must be #queries x k exactly")
    assert(row.getBoolean(1), "IVF dense recall fell below the floor")
    assert(row.getBoolean(2), "fused-list overlap fell below the floor")
  }

  test("the fused output shape matches d90's when both arms are brute (sanity)") {
    val d = Tables.load(spark, dir, "documents")
    val e = Tables.load(spark, dir, "embeddings")
    val lex = Retrieval.bm25TopK(d, col("text"), col("doc_id"),
      d.filter(col("doc_id") % 97 === 0), col("text"), col("doc_id"), k = 10)
    val dense = Similarity.bruteForceTopK(e,
        e.filter(col("vec_id") % 97 === 0), k = 10)
      .select(col("q_id"), col("rank"), col("neighbor_id").as("doc_id"))
    val fused = Retrieval.rrfFuse(Seq(lex, dense), k = 10)
    val perQ = fused.groupBy("q_id").count()
    assert(perQ.filter(col("count") > 10).count() == 0)
    assert(fused.filter(col("rank") < 1 || col("rank") > 10).count() == 0)
  }
}
