package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import graft.operators.Similarity

/** ANN scale rehearsal (dev tool): replicate the sf0.1 embeddings N×
  * (default 50) with shifted ids and run every ANN variant the gate
  * carries — d07 (LSH multi-probe), d13 (IVF), d32 (int8 quantized),
  * d42 (PQ) — against the d06 brute-force baseline on the SAME
  * replicated corpus, printing wall-clock AND recall@k.
  *
  * Replication by id-shift is adversarial for ANN: every replica is
  * an EXACT duplicate vector, so (a) bucketed variants get N×-deep
  * buckets (the candidate-generation cost model is stressed exactly
  * where a 100 TB corpus with boilerplate embeddings would stress
  * it), and (b) the true top-k of every query is a tie-set of
  * replicas — id-overlap against brute force is meaningless noise.
  * Recall is therefore SCORE recall: an ANN neighbor counts as a hit
  * when its cosine ≥ the query's k-th brute-force cosine − 1e-9 (the
  * standard tie-robust recall for duplicate-heavy corpora); the raw
  * id-overlap is printed alongside for reference.
  *
  * Usage: graft.tools.AnnRehearsal [sfDir] [factor] [k] */
object AnnRehearsal {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(50)
    val k = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = Tables.session("ann-rehearsal",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    run(spark, dir, factor, k)
    spark.stop()
  }

  def run(spark: SparkSession, dir: String, factor: Int, k: Int): Unit = {
    val base = Tables.load(spark, dir, "embeddings")
    val shift = base.agg(max("vec_id")).head.getLong(0) + 1
    val big = (0 until factor).map(i =>
      base.select((col("vec_id") + i * shift).as("vec_id"),
        col("embedding"), col("label")))
      .reduce(_ unionByName _)
      .repartition(32).persist()
    // fixed query set: 50 originals (ids < shift, present unshifted in
    // the replicated corpus as replica 0)
    val queries = base.filter(col("vec_id") < 50).persist()
    println(s"corpus 1x=${base.count()} ${factor}x=${big.count()} vecs; " +
      s"queries=${queries.count()} k=$k")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // ground truth on the replicated corpus (also the wall baseline);
    // kth-score per query is the tie-robust recall threshold
    val bf = Similarity.bruteForceTopK(big, queries, k).persist()
    timed(s"brute force ${factor}x")(bf.count())
    val kth = bf.groupBy("q_id").agg(min(col("cos")).as("kth_cos"))
    val bfIds = bf.select(col("q_id"), col("neighbor_id"))
    val nTruth = bf.count()
    // exact re-scorer: the PQ/int8 variants return APPROXIMATE scores
    // in their cos column, so recall must re-score the returned
    // neighbors with the true cosine before comparing to the brute
    // force threshold (otherwise quantization error, not retrieval
    // quality, drives the number)
    val corpusV = big.select(col("vec_id").as("neighbor_id"),
      Similarity.toDouble(col("embedding")).as("cv"))
      .withColumn("cn", Similarity.norm(col("cv"))).persist()
    val queryV = queries.select(col("vec_id").as("q_id"),
      Similarity.toDouble(col("embedding")).as("qv"))
      .withColumn("qn", Similarity.norm(col("qv")))

    def recall(name: String, ann: => DataFrame): Unit = {
      val got = ann.persist()
      val n = timed(s"$name ${factor}x")(got.count())
      val exact = got.select(col("q_id"), col("neighbor_id"))
        .join(corpusV, Seq("neighbor_id"))
        .join(broadcast(queryV), Seq("q_id"))
        .withColumn("true_cos",
          Similarity.dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      // 1e-5 tolerance: the topK scores are rounded to 6 decimals, so
      // an exact tie can sit up to 5e-7 below the rounded threshold
      val scoreHits = exact.join(kth, Seq("q_id"))
        .filter(col("true_cos") >= col("kth_cos") - 1e-5).count()
      val idHits = got.select(col("q_id"), col("neighbor_id"))
        .join(bfIds, Seq("q_id", "neighbor_id"), "left_semi").count()
      println(f"  -> $name: score-recall ${scoreHits * 100.0 / nTruth}%5.1f%% " +
        f"(id-overlap ${idHits * 100.0 / nTruth}%5.1f%%, $n rows)")
      got.unpersist()
    }

    recall("lsh multiprobe (d07)",
      Similarity.lshTopK(big, queries, k))
    recall("lsh single-probe",
      Similarity.lshTopK(big, queries, k, multiProbe = false))
    recall("ivf nprobe=2 (d13)",
      Similarity.ivfTopK(big, queries, k))
    recall("ivf nprobe=1",
      Similarity.ivfTopK(big, queries, k, nProbe = 1))
    recall("int8 quantized (d32)",
      Similarity.quantizedTopK(big, queries, k))
    recall("pq m=8 codes=64 (d42)",
      Similarity.pqTopK(big, queries, k))

    bf.unpersist(); big.unpersist(); queries.unpersist()
  }
}
