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

  /** Register the SQL-callable custom expressions: `slurm_time`,
    * `tres_extract`, `topk_by_score`, `dot_product`, `bloom_agg`,
    * `bloom_contains`, `poly_token_hashes`, `poly_minhash_bands`,
    * `deflate_len`, `nfkc_normalize`, `jaccard_sim`. */
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
    reg.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => graft.functions.BloomFilterAgg(exprs(0), exprs(1), exprs(2)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "bloom_contains",
      exprs => graft.functions.BloomContainsExpr(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "kmv_agg",
      exprs => graft.functions.KmvSketchAgg(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "poly_token_hashes",
      exprs => graft.functions.PolyTokenHashExpr(exprs.head), "built-in")
    // fused minhash banding with the standard 4×4 configuration —
    // `posexplode(poly_minhash_bands(text))` gives (band_idx, band_hash)
    reg.createOrReplaceTempFunction(
      "poly_minhash_bands",
      exprs => graft.functions.PolyMinhashBandsExpr(exprs.head, 4, 4),
      "built-in")
    reg.createOrReplaceTempFunction(
      "deflate_len",
      exprs => graft.functions.DeflateLenExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "nfkc_normalize",
      exprs => graft.functions.NfkcNormalizeExpr(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "jaccard_sim",
      exprs => graft.functions.JaccardSimExpr(exprs(0), exprs(1)), "built-in")
    // PhraseCountsExpr / WordPieceEncodeExpr carry compiled automaton /
    // vocab objects and stay Column-API-only (TextOps.phraseCounts,
    // TextOps.wordpieceEncode) — a SQL surface would need a literal
    // re-compile per call site
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

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction

  // Direct Expression↔Column bridge. Spark 4 marks the seam
  // private[sql] (classic.ExpressionUtils), but the static forwarders
  // are public bytecode — reach them reflectively once per JVM. Why it
  // matters: `call_function` resolves at ANALYSIS time against the
  // ANALYZING session's function registry, so a Column built while a
  // different session was active dies with UNRESOLVED_ROUTINE in any
  // other session (AnsiRobustnessSpec pins the multi-session case); a
  // direct expression column belongs to no session at all.
  private lazy val bridge: Option[(Expression => Column, Column => Expression)] =
    try {
      val cls = Class.forName("org.apache.spark.sql.classic.ExpressionUtils")
      val toCol = cls.getMethod("column", classOf[Expression])
      val toExpr = cls.getMethod("expression", classOf[Column])
      val f = (e: Expression) => toCol.invoke(null, e).asInstanceOf[Column]
      val g = (c: Column) => toExpr.invoke(null, c).asInstanceOf[Expression]
      g(f(org.apache.spark.sql.catalyst.expressions.Literal(1))) // smoke both ways
      Some((f, g))
    } catch { case _: Throwable => None }

  /** Build a Column from a custom expression, session-independently.
    * `build` receives the argument Columns' expressions; aggregate
    * functions are wrapped the way the analyzer would. Falls back to
    * the per-session registry + `call_function` if the reflective
    * bridge is unavailable (e.g. a future Spark moved the class). */
  def columnOf(name: String, build: Seq[Expression] => Expression,
               args: Column*): Column = bridge match {
    case Some((toCol, toExpr)) =>
      toCol(build(args.map(toExpr)) match {
        case a: AggregateFunction => a.toAggregateExpression()
        case e => e
      })
    case None =>
      ensureRegistered()
      org.apache.spark.sql.functions.call_function(name, args: _*)
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
