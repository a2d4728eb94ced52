package graft.tools

import graft._

/** Dumps `explain formatted` for every headline query so plan shape can
  * be audited (pushdown reaching the scan, broadcast joins chosen, no
  * redundant exchanges, wide WholeStageCodegen spans).
  * Usage: graft.tools.PlanAudit [sfDir] [outFile]. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/tmp/plans.txt")
    val spark = Tables.session("graft-plans", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val w = new java.io.PrintWriter(out)
    ((Bench.HEADLINERS :+ "q15_asof_join") ++ args.drop(2)).distinct.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      w.println(s"========== $name ==========")
      w.println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      w.println()
    }
    w.close()
    println(s"plans -> $out")
    spark.stop()
  }
}
