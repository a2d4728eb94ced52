package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.{DotProductExpr, SlurmTimeParse, TopKByScore, TresExtractExpr}

/** SQL-first entry point: register graft's custom expressions and the
  * slurm views so everything a reference user did with sqlite SQL works
  * as `spark.sql(...)` verbatim-ish:
  *
  * {{{
  * GraftFunctions.register(spark)
  * GraftFunctions.registerSlurmViews(spark, slurmTable)
  * spark.sql("SELECT slurm_time('1-02:00:00'), tres_extract(AllocTRES, 'mem') FROM slurm")
  * spark.sql("SELECT * FROM eff WHERE CPUeff < 0.5")
  * }}}
  */
object GraftFunctions {

  /** Register `slurm_time`, `tres_extract`, `topk_by_score`,
    * `dot_product` for SQL. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "slurm_time", exprs => SlurmTimeParse(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "tres_extract", exprs => TresExtractExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "topk_by_score", exprs => TopKByScore(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction(
      "dot_product", exprs => DotProductExpr(exprs(0), exprs(1)), "built-in")
  }

  /** Idempotent per-session registration for the `.column` helpers:
    * registering on every call floods the log with "replaced a
    * previously registered function" warnings (round-1 bench tail). */
  def ensureRegistered(): Unit = {
    val spark = SparkSession.active
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("slurm_time")))
      register(spark)
  }

  /** Register the reference's table + views as temp views
    * (`slurm`, `allocations`, `steps`, `eff`). */
  def registerSlurmViews(spark: SparkSession, slurm: DataFrame): Unit = {
    slurm.createOrReplaceTempView("slurm")
    graft.slurm.SlurmViews.allocations(slurm).createOrReplaceTempView("allocations")
    graft.slurm.SlurmViews.steps(slurm).createOrReplaceTempView("steps")
    graft.slurm.SlurmViews.eff(slurm).createOrReplaceTempView("eff")
  }
}
