package graft.tools

import org.apache.spark.sql.functions._
import graft._
import graft.operators.{Components, Similarity}

/** Stage profiler for the d95/d20 connected-components path (dev
  * tool): times pair generation, CC, and the soft-weight join
  * separately, and prints per-round CC progress so the round count ×
  * per-round fixed cost split is visible. Usage:
  * graft.tools.CcProf [sfDir] [reps]. */
object CcProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Tables.session("cc-prof", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val e = Tables.load(spark, dir, "embeddings",
      spread = !args.lift(2).contains("nospread"))
    def time(n: String)(f: => Long): Double = {
      val t0 = System.nanoTime; val c = f
      val dt = (System.nanoTime - t0) / 1e9
      println(f"$n%-26s $dt%6.2f s  ($c rows)")
      dt
    }
    for (r <- 1 to reps) {
      println(s"--- rep $r (exact query shape, nothing pre-persisted)")
      val pairs = Similarity.cosinePairs(e, threshold = 0.3)
        .select(col("vec_a").as("src"), col("vec_b").as("dst"))
      time("cosinePairs solo")(pairs.count())
      val verts = e.select(col("vec_id").as("id"))
      val t0 = System.nanoTime
      val cc = Components.connectedComponents(verts, pairs)
      time("connectedComponents")(cc.count())
      val soft = graft.operators.Dedup.softWeights(cc, col("id"), col("label"))
      time("softWeights")(soft.count())
      println(f"  total ${(System.nanoTime - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
