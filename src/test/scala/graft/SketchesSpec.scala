package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** The sketch operators' two contracts: accuracy (estimates land inside
  * the advertised tolerance on real corpus data) and MERGEABILITY
  * (per-partition sketches union to the global answer with no loss —
  * the property that makes them the 100 TB path). */
class SketchesSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  val dir = "/root/testdata/sf0.001"
  lazy val docs = Tables.load(spark, dir, "documents")

  test("HLL and HLL++ distinct estimates land within 5% on the corpus") {
    val rep = Sketches.distinctReport(docs, col("text"), col("lang"))
    val rows = rep.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_within_tol"), s"HLL off on ${r.get(0)}")
      assert(r.getAs[Boolean]("acd_within_tol"), s"HLL++ off on ${r.get(0)}")
    }
  }

  test("approx percentiles land within the rank-tolerance window on the corpus") {
    val rep = Sketches.quantileReport(docs, col("n_chars"), col("source"))
    rep.collect().foreach { r =>
      assert(r.getAs[Boolean]("p50_within_tol"), s"p50 off on ${r.get(0)}")
      assert(r.getAs[Boolean]("p90_within_tol"), s"p90 off on ${r.get(0)}")
    }
  }

  test("CMS heavy hitters: verdicts hold and the top tokens match the exact groupBy") {
    val rep = Sketches.heavyHitters(docs, col("text"), topN = 10).collect()
    assert(rep.length == 10)
    rep.foreach { r =>
      assert(r.getAs[Boolean]("cms_within_tol"),
        s"CMS estimate off for '${r.get(0)}'")
    }
    val exact = docs.select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t"))
      .limit(10).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rep.map(r => (r.getString(0), r.getLong(1))).toSeq == exact.toSeq)
  }

  test("per-partition HLL sketches merge losslessly to the global estimate") {
    // sketch per partition + union == sketch the whole column directly:
    // the distributed two-level reduce gives the SAME estimate, which is
    // why 1000 executors can sketch independently
    val (direct, merged) = Sketches.mergeDemo(docs.repartition(13), col("text"))
    assert(direct == merged, s"direct=$direct merged=$merged")
    // and the estimate itself is sane vs the exact count
    val exact = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .distinct().count()
    assert(math.abs(direct - exact).toDouble / exact <= 0.05)
  }
}
