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

  test("LSH miner recalls >= 90% of PLANTED translation pairs; exact finds them all") {
    // The regime bitext mining actually runs in: true translation
    // pairs sit at cos ≈ 0.99, far above the ~0 background (the
    // sf embeddings are near-random — max cross-cos 0.48 — so
    // "recall of noise pairings" is meaningless for either miner;
    // recall of PLANTED structure is the operational claim).
    val rnd = new scala.util.Random(42)
    def vec() = Seq.fill(64)(rnd.nextGaussian())
    def mix(v: Seq[Double], w: Seq[Double], eps: Double) =
      v.zip(w).map { case (x, y) => (1 - eps) * x + eps * y }
    val as = (0 until 40).map(i => (i.toLong * 2, vec()))
    val bs = as.map { case (id, v) => (id + 1, mix(v, vec(), 0.02)) } ++
      (0 until 40).map(i => (1000L + i * 2 + 1, vec()))
    val a = as.toDF("vec_id", "embedding")
    val b = bs.toDF("vec_id", "embedding")
    val planted = as.map { case (id, _) => (id, id + 1) }.toSet
    val exact = Similarity.bitextMine(a, b, k = 4, minMargin = 1.02)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.bitextMineLsh(a, b, k = 4, minMargin = 1.02)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((planted -- exact).isEmpty,
      s"exact miner missed planted pairs: ${planted -- exact}")
    val recall = (planted & lsh).size.toDouble / planted.size
    info(f"planted=${planted.size} lsh=${lsh.size} recall=$recall%.3f")
    assert(recall >= 0.9, f"LSH miner planted recall $recall%.3f < 0.9")
    // mutual-argmax property holds on the LSH path too
    assert(lsh.toSeq.map(_._1).distinct.size == lsh.size)
    assert(lsh.toSeq.map(_._2).distinct.size == lsh.size)
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
