package graft.tools

import graft.{SparkEntry, Tables}

/** Solo query timing — isolates one gate query from bench noise:
  * `graft.tools.QueryTimer <sfDir> <queryKey> [reps]` runs an untimed
  * warmup then `reps` timed executions and prints min + all reps.
  * Bench's min-of-3-over-67-queries can't attribute a regression to a
  * single plan under machine load; this can. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val key = args.lift(1).getOrElse("q01_agg")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = Tables.session("query-timer",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val q = SparkEntry.queries.getOrElse(key,
      sys.error(s"unknown query '$key'"))
    q(spark, dir).count() // warmup: JIT + codegen + scan cache
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime
      q(spark, dir).count()
      (System.nanoTime - t0) / 1e9
    }
    println(f"$key min ${ts.min}%.3f s  (reps ${ts.map(t => f"$t%.3f").mkString(", ")})")
    spark.stop()
  }
}
