package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** The KMV sketch contract (d112): the aggregate is an EXACT bottom-k
  * distinct set (so every downstream estimate is deterministic), it is
  * partitioning-invariant (the mergeability that makes it a cluster
  * primitive), minima NEST across k (one pass serves every k), and the
  * overlap operator's undersized mode degrades to exact counting. */
class KmvSketchSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def sketch(values: Seq[Long], k: Int, parts: Int): Seq[Long] =
    values.toDF("h").repartition(parts)
      .agg(graft.functions.KmvSketchAgg.column(col("h"), lit(k)).as("s"))
      .head.getSeq[Long](0)

  test("kmv sketch = sorted distinct bottom-k, invariant to partitioning") {
    val rnd = new scala.util.Random(42)
    val values = Seq.fill(5000)(rnd.nextLong(1000000L))
    val want = values.distinct.sorted.take(64)
    assert(sketch(values, 64, 1) == want)
    assert(sketch(values, 64, 7) == want)
    assert(sketch(values, 64, 32) == want)
  }

  test("kmv minima nest: the k=4096 sketch contains every smaller k as a prefix") {
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(9000)(rnd.nextLong())
    val big = sketch(values, 4096, 8)
    assert(big.take(64) == sketch(values, 64, 8))
    assert(big.take(512) == sketch(values, 512, 8))
  }

  test("kmv undersized sketch holds the whole distinct set exactly") {
    val values = Seq(5L, 3L, 3L, 9L, 1L, 9L)
    assert(sketch(values, 100, 3) == Seq(1L, 3L, 5L, 9L))
  }

  test("kmv_agg is SQL-registered") {
    GraftFunctions.register(spark)
    Seq(4L, 2L, 2L, 8L).toDF("h").createOrReplaceTempView("kmv_in")
    val got = spark.sql("SELECT kmv_agg(h, 2) AS s FROM kmv_in")
      .head.getSeq[Long](0)
    assert(got == Seq(2L, 4L))
  }

  test("d112 overlap: undersized mode returns EXACT union and intersection") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val row = Sketches.kmvOverlap(docs, col("text"), col("doc_id"))
      .filter(col("k") === 4096).head
    // ground truth via the same fingerprint, computed exactly
    val withH = docs.select(col("doc_id"),
      graft.operators.TextOps.fingerprint(col("text")).as("h"))
    val a = withH.filter(col("doc_id") % 2 === 0).select("h").distinct()
    val b = withH.filter(col("doc_id") % 3 === 0).select("h").distinct()
    val union = a.union(b).distinct().count()
    val inter = a.intersect(b).count()
    assert(row.getAs[Long]("n_sketch") == union)
    assert(row.getAs[Long]("est_union") == union)
    assert(row.getAs[Long]("inter_in_sketch") == inter)
    assert(row.getAs[Long]("est_inter") == inter)
  }

  test("d112 overlap: estimate mode lands within KMV error bounds at k=64") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val row = Sketches.kmvOverlap(docs, col("text"), col("doc_id"))
      .filter(col("k") === 64).head
    val withH = docs.select(col("doc_id"),
      graft.operators.TextOps.fingerprint(col("text")).as("h"))
    val a = withH.filter(col("doc_id") % 2 === 0).select("h").distinct()
    val b = withH.filter(col("doc_id") % 3 === 0).select("h").distinct()
    val union = a.union(b).distinct().count().toDouble
    val inter = a.intersect(b).count().toDouble
    // KMV relative std ≈ 1/sqrt(k) ≈ 12.5%; allow 4 sigma
    assert(math.abs(row.getAs[Long]("est_union") - union) / union < 0.5)
    assert(math.abs(row.getAs[Long]("est_inter") - inter) / math.max(inter, 1.0) < 0.75)
  }

  test("kmvCompare finisher on PERSISTED sketches equals kmvOverlap, every field") {
    // sketch once per corpus side, persist the arrays, estimate later
    // WITHOUT re-aggregating — the warehoused-sketch deployment shape
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val withH = docs.select(col("doc_id"),
      graft.operators.TextOps.fingerprint(col("text")).as("h"))
    val persisted = withH.agg(
      graft.functions.KmvSketchAgg.column(
        when(col("doc_id") % 2 === 0, col("h")), lit(4096)).as("sa"),
      graft.functions.KmvSketchAgg.column(
        when(col("doc_id") % 3 === 0, col("h")), lit(4096)).as("sb"))
      .head
    import spark.implicits._
    val sketchRow = Seq((persisted.getAs[Seq[Long]]("sa").toArray,
      persisted.getAs[Seq[Long]]("sb").toArray)).toDF("sa", "sb")
    for (k <- Seq(64, 4096)) {
      val got = sketchRow.select(
        Sketches.kmvCompare(col("sa"), col("sb"), lit(k)).as("r"))
        .select(col("r.*")).head
      val want = Sketches.kmvOverlap(docs, col("text"), col("doc_id"))
        .filter(col("k") === k).head
      for (f <- Seq("n_sketch", "kth_min", "inter_in_sketch",
        "est_union", "est_inter"))
        assert(got.getAs[Long](f) == want.getAs[Long](f),
          s"k=$k field $f: ${got.getAs[Long](f)} != ${want.getAs[Long](f)}")
      assert(got.getAs[Long]("jaccard_ppm") ==
        want.getAs[Long]("est_inter") * 1000000L / want.getAs[Long]("est_union"))
    }
  }
}
