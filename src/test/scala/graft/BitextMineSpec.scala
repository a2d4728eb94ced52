package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Margin-based bitext mining: mutual-best pairing, hub suppression
  * (the margin's whole point vs raw cosine), and thresholding. */
class BitextMineSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def df(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  test("clean mutual matches mine; a hub pairs once, not everywhere") {
    // A-side: two orthogonal directions + a "hub" vector that has
    // moderate cosine to EVERYTHING on the B side
    val a = df(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (4L, Seq(0.5, 0.5, 0.5, 0.5)))
    val b = df(
      (1L, Seq(0.9, 0.1, 0.0, 0.0)),   // near A:0
      (3L, Seq(0.1, 0.9, 0.0, 0.0)),   // near A:2
      (5L, Seq(0.0, 0.0, 1.0, 0.1)),   // near A:4's tail dims
      (7L, Seq(0.0, 0.0, 0.1, 1.0)))
    val mined = Similarity.bitextMine(a, b, k = 2, minMargin = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the clean pairs must be mined; every a_id/b_id appears at most
    // once (mutual-argmax property — a hub cannot claim several)
    assert(mined.contains((0L, 1L)) && mined.contains((2L, 3L)))
    assert(mined.map(_._1).size == mined.size)
    assert(mined.map(_._2).size == mined.size)
  }

  test("margin threshold drops uniform similarity (nothing stands out)") {
    // every cross pair has identical cosine -> margin == 1 everywhere;
    // a strict threshold mines nothing
    val a = df((0L, Seq(1.0, 0.0)), (2L, Seq(1.0, 0.0)))
    val b = df((1L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)))
    assert(Similarity.bitextMine(a, b, k = 2, minMargin = 1.01).count() == 0)
  }

  test("mined pairs are mutual best by margin, not just cosine") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val mined = Similarity.bitextMine(e.filter(col("vec_id") % 2 === 0),
      e.filter(col("vec_id") % 2 === 1), k = 4, minMargin = 1.02)
    val rows = mined.collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    assert(rows.forall(_.getDouble(3) >= 1.02))
  }
}
