// Dev harness: classic vs df-cutoff-pruned BM25 probe at sf0.1 —
// min-of-N in one JVM, alternating so JIT/cache warmup is shared.
package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.Retrieval

object BmPruneBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = graft.Tables.session("bm-prune-bench",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val d = graft.Tables.load(spark, dir, "documents", spread = true)
    val qs = d.filter(col("doc_id") % 97 === 0)
    def classic() = Retrieval.bm25TopK(d, col("text"), col("doc_id"),
      qs, col("text"), col("doc_id"), k = 10).count()
    def pruned() = Retrieval.bm25TopKPruned(d, col("text"), col("doc_id"),
      qs, col("text"), col("doc_id"), k = 10).count()
    classic(); pruned() // warmup both
    val (tc, tp) = (Array.fill(reps)(0.0), Array.fill(reps)(0.0))
    for (i <- 0 until reps) {
      var t0 = System.nanoTime; classic(); tc(i) = (System.nanoTime - t0) / 1e9
      t0 = System.nanoTime; pruned(); tp(i) = (System.nanoTime - t0) / 1e9
    }
    println(f"classic min ${tc.min}%.3f s (${tc.map(t => f"$t%.2f").mkString(",")})")
    println(f"pruned  min ${tp.min}%.3f s (${tp.map(t => f"$t%.2f").mkString(",")})")
    spark.stop()
  }
}
