package graft.tools

import org.apache.spark.sql.functions._
import graft._
import graft.operators._

/** Ad-hoc micro-profiler for operator stages (dev tool, not part of the
  * driver contract). Usage: graft.tools.Prof [sfDir]. */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Tables.session("prof", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val c = f
      println(f"$n%-28s ${(System.nanoTime - t0) / 1e9}%7.2f s  ($c)")
    }
    time("docs.count") { docs.count() }
    time("docs.count again") { docs.count() }
    time("tokenize 1") { docs.select(explode(split(lower(col("text")), "\\s+"))).count() }
    time("tokenize 2") { docs.select(explode(split(lower(col("text")), "\\s+"))).count() }
    println("partitions: " + docs.rdd.getNumPartitions)
    time("repart tokenize") { docs.repartition(32).select(explode(split(lower(col("text")), "\\s+"))).count() }
    time("shingle explode") { docs.select(explode(Dedup.shingles(col("text")))).count() }
    time("repart shingle explode") { docs.repartition(32).select(explode(Dedup.shingles(col("text")))).count() }
    time("candidates 1") { Dedup.minhashCandidates(docs, col("text"), col("doc_id")).count() }
    time("candidates 2") { Dedup.minhashCandidates(docs, col("text"), col("doc_id")).count() }
    spark.stop()
  }
}
