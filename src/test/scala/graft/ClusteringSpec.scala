package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Distributed k-means and PQ-ANN contracts: deterministic under
  * repartitioning (the property that makes rows-only gating honest),
  * clusters that actually track the planted label structure, and PQ
  * recall that stays close to float brute force. */
class ClusteringSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  val dir = "/root/testdata/sf0.001"
  lazy val emb = Tables.load(spark, dir, "embeddings").cache()

  test("k-means assignments are repartition-invariant (deterministic)") {
    val a = Similarity.clusterAssignments(emb, k = 8, iters = 5)
    val b = Similarity.clusterAssignments(emb.repartition(7), k = 8, iters = 5)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("k-means training improves cohesion (the objective) over the untrained seed") {
    // cohesion = mean cosine of each vector to its own centroid — what
    // Lloyd iterations maximize. (The synthetic embeddings carry no
    // label signal — within-label mean cosine ≈ across-label ≈ 0 — so
    // label purity is unlearnable by design; the objective is the
    // honest property to pin.)
    def cohesion(iters: Int): Double = {
      val assign = Similarity.clusterAssignments(emb, k = 8, iters = iters)
      val e = assign.join(emb.select(col("vec_id"), col("embedding")), "vec_id")
        .select(col("cluster"), Similarity.toDouble(col("embedding")).as("v"))
      val cents = e.select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim").agg(avg(col("x")).as("m"))
        .groupBy("cluster")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s("m")).as("c"))
      e.join(cents, "cluster")
        .select((Similarity.dot(col("v"), col("c")) /
          (Similarity.norm(col("v")) * Similarity.norm(col("c")))).as("cos"))
        .agg(avg("cos")).head.getDouble(0)
    }
    val trained = cohesion(5)
    val seed = cohesion(0)
    assert(trained > seed, s"training did not improve cohesion: $trained <= $seed")
  }

  test("k-means++ seeding separates planted clusters under an adversarial id ordering") {
    import spark.implicits._
    // 4 orthogonal planted clusters, 50 points each, ids arranged so
    // the LOWEST 50 ids all live in cluster 0 — the ordering that
    // defeats lowest-id seeding (all k seeds land in one region and
    // iters=0 cannot tell the other three clusters apart). The ++
    // Gumbel race must put one seed in each cluster: within-cluster
    // D² ~ 1e-7 vs between ~ 1, a log-gap no Gumbel noise crosses.
    def jit(i: Int, d: Int): Double = ((i * 31 + d * 17) % 7 - 3) * 1e-4
    val pts = for (c <- 0 until 4; i <- 0 until 50) yield {
      val v = Array.tabulate(8)(d => (if (d == c * 2) 1.0 else 0.0) + jit(c * 50 + i, d))
      ((c * 50 + i).toLong, v.toSeq, c)
    }
    val e = pts.map(p => (p._1, p._2)).toDF("vec_id", "embedding")
    val truth = pts.map(p => (p._1, p._3)).toDF("vec_id", "planted")
    val seedAssign = Similarity.clusterAssignments(e, k = 4, iters = 0)
      .join(truth, "vec_id")
    // every planted cluster maps to its OWN cell, 100% purity at
    // iters=0 — pure seeding quality, no Lloyd rescue
    val cells = seedAssign.groupBy("planted")
      .agg(countDistinct("cluster").as("nc"), first("cluster").as("c"))
      .collect()
    assert(cells.forall(_.getLong(1) == 1L),
      s"a planted cluster split across cells: ${cells.mkString(", ")}")
    assert(cells.map(_.getLong(2)).distinct.length == 4,
      s"planted clusters merged into shared cells: ${cells.mkString(", ")}")
    // and the lowest-id seeding really does fail here (the regression
    // this guards): seeds = the 4 lowest ids, all cluster-0 vectors —
    // purity collapses to chance for clusters 1..3
    val lowSeeds = pts.take(4).map(_._2.toArray)
    val lowCos = (v: org.apache.spark.sql.Column) => array(lowSeeds.map { c =>
      Similarity.dot(v, typedlit(c.toSeq)) /
        (Similarity.norm(v) * math.sqrt(c.map(x => x * x).sum))
    }: _*)
    val lowAssign = e.select(col("vec_id"),
        Similarity.toDouble(col("embedding")).as("v"))
      .withColumn("cluster",
        array_position(lowCos(col("v")), array_max(lowCos(col("v")))) - 1)
      .join(truth, "vec_id")
    // clusters 1..3 are near-equidistant from the 4 near-identical
    // seeds, so their points argmax on jitter noise: a planted cluster
    // either scatters across cells or collides with another — it
    // cannot be both internally consistent AND separated the way the
    // ++ assignment above is
    val lowCells = lowAssign.filter(col("planted") > 0)
      .groupBy("planted")
      .agg(countDistinct("cluster").as("nc"), first("cluster").as("c"))
      .collect()
    val lowScattered = lowCells.exists(_.getLong(1) > 1L)
    val lowMerged = lowCells.map(_.get(2)).distinct.length < lowCells.length
    assert(lowScattered || lowMerged,
      s"fixture not adversarial for lowest-id seeds: ${lowCells.mkString(", ")}")
  }

  test("PQ ANN recall@5 stays close to float brute force") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select(col("q_id"), col("neighbor_id"))
    val pq = Similarity.pqTopK(emb, queries, k = 5)
      .select(col("q_id"), col("neighbor_id"))
    val hit = pq.join(exact, Seq("q_id", "neighbor_id")).count()
    val recall = hit.toDouble / exact.count()
    // near-isotropic synthetic embeddings are PQ's worst case; 40-bit
    // codes land well above random (random top-5 of 500 ≈ 0.01).
    // Measured 0.37-0.45 here across seeding variants (lowest-id vs
    // k-means++ draws) — the bound sits under that band, 35x random,
    // and the d42 gate pins the deployment floor at 0.20
    assert(recall >= 0.35, s"PQ recall@5 = $recall")
  }

  test("PQ codes compress: every code within [0, codes); reconstruction norm positive") {
    val e = emb
    val res = Similarity.pqTopK(e, e.filter(col("vec_id") < 3), k = 5)
    // scored against codes only — sanity: results exist for every query
    assert(res.groupBy("q_id").count().count() == 3)
    assert(res.filter(col("cos").isNull || col("cos") > 1.0001).count() == 0)
  }
}
