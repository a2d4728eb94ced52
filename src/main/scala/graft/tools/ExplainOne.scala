package graft.tools

import graft.{SparkEntry, Tables}

/** Prints one gate query's optimized logical + formatted physical
  * plan: `graft.tools.ExplainOne <sfDir> <key>`. The per-operator
  * audit loop ("is the parse pruned? is the join broadcast?") needs
  * the OPTIMIZED plan, which PlanAudit's formatted dump hides behind
  * codegen'd project nodes. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val key = args.lift(1).getOrElse("q01_agg")
    val spark = Tables.session("explain-one",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val df = SparkEntry.queries(key)(spark, dir)
    println("=== optimized logical ===")
    println(df.queryExecution.optimizedPlan.treeString)
    println("=== physical (formatted) ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
