package graft.slurm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic slurm accounting table, derived from the
  * driver's `orders` parquet (TESTDATA.md) — the vehicle that lets the
  * DuckDB oracle check graft's slurm parsing semantics end-to-end.
  *
  * The SAME construction exists twice: [[raw]] builds the sacct-format
  * strings with Spark columns, and [[sqlPrefix]] builds them as DuckDB
  * CTEs. Gate queries parse [[raw]] with `SlurmFunctions` while the
  * oracle computes expected values arithmetically from the `ints` CTE —
  * a hash match therefore proves the parser, not the string builder.
  */
object SlurmSim {

  val ISO = "yyyy-MM-dd'T'HH:mm:ss"

  /** Spark-side: integer derivation columns from orders. */
  def ints(spark: SparkSession, dir: String): DataFrame = {
    val o = graft.Tables.load(spark, dir, "orders", spread = true)
    val k = col("o_orderkey")
    o.select(
      k.as("k"),
      col("o_orderdate").as("d"),
      ((k * 37) % 400000).as("e"),
      (lit(1) + k % 64).as("cpus"),
      (lit(1) + k % 4).as("nnodes"),
      (lit(256) * (lit(1) + k % 32)).as("memmb"),
      (k % 5).as("gpus"),
      (k % 101).as("util"),
      (k % 100).as("pct"),
      expr("(((o_orderkey * 37) % 400000) * (1 + o_orderkey % 64) * (o_orderkey % 100)) div 100").as("cpu_used"),
      expr("(256 * (1 + o_orderkey % 32) * (o_orderkey % 90)) div 100").as("mem_used"),
      (k % 86400).as("subsec"),
      (k % 3600).as("qsec"),
      (lit(1) + k % 1000).as("amt"),
      (k % 4).as("code"),
      (k % 3).as("sig"),
      (k % 100).as("bill"),
      (lit(1) + k % 10000).as("tlmin"),
      (k % 7).as("arr"),
      (k % 3).as("stp"),
      (k % 4).as("m4"),
      (k % 11).as("m11"),
      (k % 13).as("m13"),
      expr("(o_orderkey div 3) % 3").as("sfxi"),
      (k % 37).as("uid"),
      (k % 100000).as("dr"),
      (k % 70000).as("dw"))
  }

  private def fmtTime(x: Column): Column = {
    import graft.functions.SlurmFunctions.formatSlurmTime
    formatSlurmTime(x)
  }

  /** Spark-side: the raw sacct-format string table. */
  def raw(spark: SparkSession, dir: String): DataFrame = {
    val i = ints(spark, dir)
    val k = col("k")
    val iso = (c: Column) => date_format(c, ISO)
    val ts = (secs: String) => expr(s"timestampadd(SECOND, $secs, d)")
    val unit = expr("CASE k % 3 WHEN 0 THEN 'K' WHEN 1 THEN 'M' ELSE 'G' END")
    val sfx = expr("CASE sfxi WHEN 0 THEN 'n' WHEN 1 THEN 'c' ELSE '' END")
    val gpuAlloc = when(col("gpus") > 0,
      concat(lit(",gres/gpu="), col("gpus"), lit(",gres/gpu:a100="), col("gpus"))).otherwise(lit(""))
    val gpuUsage = when(col("gpus") > 0,
      concat(lit(",gres/gpumem="), col("mem_used"), lit("M,gres/gpuutil="), col("util"))).otherwise(lit(""))
    i.select(
      // nnodes rides along as the NNodes sacct column (case-insensitive
      // name collision otherwise)
      i.columns.filterNot(_ == "nnodes").map(col) ++ Seq[Column](
        when(col("m4") === 0, k.cast("string"))
          .when(col("m4") === 1, format_string("%d_%d", k, col("arr")))
          .when(col("m4") === 2, format_string("%d.%d", k, col("stp")))
          .otherwise(format_string("%d_%d.%d", k, col("arr"), col("stp"))).as("JobID"),
        when(col("m4").isin(2, 3), format_string("%d.%d", k, col("stp")))
          .otherwise(k.cast("string")).as("JobIDRaw"),
        concat(lit("user_"), col("uid")).as("User"),
        expr("CASE k % 4 WHEN 0 THEN 'batch' WHEN 1 THEN 'gpu' WHEN 2 THEN 'interactive' ELSE 'long' END").as("Partition"),
        when(col("m11") === 0, "RUNNING")
          .when(col("code") === 0, "COMPLETED").otherwise("FAILED").as("State"),
        when(col("m13") === 0, "UNLIMITED")
          .otherwise(col("tlmin").cast("string")).as("Timelimit"),
        fmtTime(col("e")).as("Elapsed"),
        iso(ts("subsec")).as("Submit"),
        iso(ts("subsec + qsec")).as("Start"),
        when(col("m11") === 0, "Unknown")
          .otherwise(iso(ts("subsec + qsec + e"))).as("End"),
        concat(format_string("%d", col("amt")), unit, sfx).as("ReqMem"),
        col("nnodes").as("NNodes"),
        col("cpus").as("NCPUS"),
        concat(lit("billing="), col("bill"), lit(",cpu="), col("cpus"),
          lit(",mem="), col("memmb"), lit("M"), gpuAlloc).as("AllocTRES"),
        concat(lit("cpu="), fmtTime(col("cpu_used")), lit(",fs/disk="), col("dr"),
          lit(",mem="), col("mem_used"), lit("M"), gpuUsage).as("TRESUsageInTot"),
        concat(lit("energy=0,fs/disk="), col("dw")).as("TRESUsageOutTot"),
        format_string("%d:%d", col("code"), col("sig")).as("ExitCode")
      ): _*)
  }

  /** Spark-side: multi-row jobs — one allocation row per order plus one
    * step row per lineitem — to exercise the per-job `eff` rollup the
    * way real sacct data does (allocation carries ReqMem/billing/state;
    * steps carry usage). Shares [[ints]]; steps derive their own ints
    * from (l_orderkey, l_linenumber). */
  def jsRaw(spark: SparkSession, dir: String): DataFrame = {
    val i = ints(spark, dir)
    val iso = (c: Column) => date_format(c, ISO)
    val ts = (secs: String) => expr(s"timestampadd(SECOND, $secs, d)")
    // jobs with m4 odd are array tasks: JobIDnostep = k_arr
    val prefix = when(col("m4") % 2 === 1, format_string("%d_%d", col("k"), col("arr")))
      .otherwise(col("k").cast("string"))
    val gpuAlloc = when(col("gpus") > 0,
      concat(lit(",gres/gpu="), col("gpus"), lit(",gres/gpu:a100="), col("gpus"))).otherwise(lit(""))

    val alloc = i.select(
      prefix.as("JobID"),
      col("k").cast("string").as("JobIDRaw"),
      concat(lit("job_"), col("k")).as("JobName"),
      concat(lit("user_"), col("uid")).as("User"),
      concat(lit("acct_"), col("k") % 5).as("Account"),
      expr("CASE k % 4 WHEN 0 THEN 'batch' WHEN 1 THEN 'gpu' WHEN 2 THEN 'interactive' ELSE 'long' END").as("Partition"),
      when(col("m11") === 0, "RUNNING")
        .when(col("code") === 0, "COMPLETED").otherwise("FAILED").as("State"),
      when(col("m13") === 0, "UNLIMITED").otherwise(col("tlmin").cast("string")).as("Timelimit"),
      fmtTime(col("e")).as("Elapsed"),
      iso(ts("subsec")).as("Submit"),
      iso(ts("subsec + qsec")).as("Start"),
      when(col("m11") === 0, "Unknown")
        .otherwise(iso(ts("subsec + qsec + e"))).as("End"),
      concat(format_string("%d", col("amt")),
        expr("CASE k % 3 WHEN 0 THEN 'K' WHEN 1 THEN 'M' ELSE 'G' END"),
        expr("CASE sfxi WHEN 0 THEN 'n' WHEN 1 THEN 'c' ELSE '' END")).as("ReqMem"),
      col("nnodes").cast("string").as("NNodes"),
      col("cpus").cast("string").as("NCPUS"),
      fmtTime(col("e") * col("cpus")).as("CPUTime"),
      concat(lit("billing="), col("bill"), lit(",cpu="), col("cpus"),
        lit(",mem="), col("memmb"), lit("M"), gpuAlloc).as("AllocTRES"),
      lit("").as("TRESUsageInTot"),
      lit("").as("TRESUsageOutTot"),
      format_string("%d:%d", col("code"), col("sig")).as("ExitCode"))

    val li = graft.Tables.load(spark, dir, "lineitem", spread = true)
      .select(col("l_orderkey").as("k"), col("l_linenumber").cast("long").as("ln"))
    val st = li.join(i, "k")
      .withColumn("se", expr("(e * (100 - ln)) div 100"))
      .withColumn("cu", expr("(se * cpus * pct) div 100"))
      .withColumn("mu", expr("(memmb * ((k + ln) % 90)) div 100"))
      .withColumn("utls", ((col("k") + col("ln")) % 5) * 25) // multiples of 25: utls/100 is binary-exact, so summed GpuUtil·Elapsed terms are order-independent across engines (sf0.1 rounding-boundary lesson)
      .withColumn("drln", (col("k") * col("ln")) % 100000)
      .withColumn("dwln", (col("k") * col("ln")) % 70000)
    val gpuUsage = when(col("gpus") > 0,
      concat(lit(",gres/gpumem="), col("mu"), lit("M,gres/gpuutil="), col("utls"))).otherwise(lit(""))
    val steps = st.select(
      concat(prefix, lit("."), col("ln")).as("JobID"),
      format_string("%d.%d", col("k"), col("ln")).as("JobIDRaw"),
      when(col("ln") === 1, "batch").otherwise(concat(lit("step_"), col("ln"))).as("JobName"),
      lit("").as("User"),
      lit("").as("Account"),
      expr("CASE k % 4 WHEN 0 THEN 'batch' WHEN 1 THEN 'gpu' WHEN 2 THEN 'interactive' ELSE 'long' END").as("Partition"),
      lit("COMPLETED").as("State"),
      lit("").as("Timelimit"),
      fmtTime(col("se")).as("Elapsed"),
      iso(ts("subsec")).as("Submit"),
      iso(ts("subsec + qsec")).as("Start"),
      iso(ts("subsec + qsec + se")).as("End"),
      lit("").as("ReqMem"),
      col("nnodes").cast("string").as("NNodes"),
      col("cpus").cast("string").as("NCPUS"),
      fmtTime(col("se") * col("cpus")).as("CPUTime"),
      concat(lit("cpu="), col("cpus"), lit(",mem="), col("memmb"), lit("M"), gpuAlloc).as("AllocTRES"),
      concat(lit("cpu="), fmtTime(col("cu")), lit(",fs/disk="), col("drln"),
        lit(",mem="), col("mu"), lit("M"), gpuUsage).as("TRESUsageInTot"),
      concat(lit("energy=0,fs/disk="), col("dwln")).as("TRESUsageOutTot"),
      lit("0:0").as("ExitCode"))

    alloc.unionByName(steps)
  }

  // ---------------- DuckDB mirror ----------------

  /** DuckDB `%d-%02d:%02d:%02d` slurm-time formatter over expression x. */
  private def sqlFmtTime(x: String): String =
    s"""CASE WHEN ($x) // 86400 > 0
       | THEN printf('%d-%02d:%02d:%02d', ($x) // 86400, (($x) % 86400) // 3600, (($x) % 3600) // 60, ($x) % 60)
       | ELSE printf('%02d:%02d:%02d', ($x) // 3600, (($x) % 3600) // 60, ($x) % 60) END""".stripMargin.replaceAll("\n", " ")

  private val sqlIso = "'%Y-%m-%dT%H:%M:%S'"

  /** The `ints` CTE body (DuckDB) — mirrors [[ints]]. */
  val intsSql: String =
    """SELECT o_orderkey AS k,
      | o_orderdate AS d,
      | (o_orderkey * 37) % 400000 AS e,
      | 1 + o_orderkey % 64 AS cpus,
      | 1 + o_orderkey % 4 AS nnodes,
      | 256 * (1 + o_orderkey % 32) AS memmb,
      | o_orderkey % 5 AS gpus,
      | o_orderkey % 101 AS util,
      | o_orderkey % 100 AS pct,
      | (((o_orderkey * 37) % 400000) * (1 + o_orderkey % 64) * (o_orderkey % 100)) // 100 AS cpu_used,
      | (256 * (1 + o_orderkey % 32) * (o_orderkey % 90)) // 100 AS mem_used,
      | o_orderkey % 86400 AS subsec,
      | o_orderkey % 3600 AS qsec,
      | 1 + o_orderkey % 1000 AS amt,
      | o_orderkey % 4 AS code,
      | o_orderkey % 3 AS sig,
      | o_orderkey % 100 AS bill,
      | 1 + o_orderkey % 10000 AS tlmin,
      | o_orderkey % 7 AS arr,
      | o_orderkey % 3 AS stp,
      | o_orderkey % 4 AS m4,
      | o_orderkey % 11 AS m11,
      | o_orderkey % 13 AS m13,
      | (o_orderkey // 3) % 3 AS sfxi,
      | o_orderkey % 37 AS uid,
      | o_orderkey % 100000 AS dr,
      | o_orderkey % 70000 AS dw
      | FROM orders""".stripMargin.replaceAll("\n", " ")

  /** The `slurm_raw` CTE body (DuckDB) — mirrors [[raw]]. */
  val rawSql: String = {
    val unit = "CASE k % 3 WHEN 0 THEN 'K' WHEN 1 THEN 'M' ELSE 'G' END"
    val sfx = "CASE sfxi WHEN 0 THEN 'n' WHEN 1 THEN 'c' ELSE '' END"
    s"""SELECT *,
       | CASE m4 WHEN 0 THEN k::VARCHAR
       |   WHEN 1 THEN printf('%d_%d', k, arr)
       |   WHEN 2 THEN printf('%d.%d', k, stp)
       |   ELSE printf('%d_%d.%d', k, arr, stp) END AS "JobID",
       | CASE WHEN m4 IN (2,3) THEN printf('%d.%d', k, stp) ELSE k::VARCHAR END AS "JobIDRaw",
       | 'user_' || uid::VARCHAR AS "User",
       | CASE k % 4 WHEN 0 THEN 'batch' WHEN 1 THEN 'gpu' WHEN 2 THEN 'interactive' ELSE 'long' END AS "Partition",
       | CASE WHEN m11 = 0 THEN 'RUNNING' WHEN code = 0 THEN 'COMPLETED' ELSE 'FAILED' END AS "State",
       | CASE WHEN m13 = 0 THEN 'UNLIMITED' ELSE tlmin::VARCHAR END AS "Timelimit",
       | ${sqlFmtTime("e")} AS "Elapsed",
       | strftime(d + to_seconds(subsec), $sqlIso) AS "Submit",
       | strftime(d + to_seconds(subsec + qsec), $sqlIso) AS "Start",
       | CASE WHEN m11 = 0 THEN 'Unknown' ELSE strftime(d + to_seconds(subsec + qsec + e), $sqlIso) END AS "End",
       | printf('%d', amt) || ($unit) || ($sfx) AS "ReqMem",
       | nnodes AS "NNodes",
       | cpus AS "NCPUS",
       | 'billing=' || bill::VARCHAR || ',cpu=' || cpus::VARCHAR || ',mem=' || memmb::VARCHAR || 'M'
       |   || CASE WHEN gpus > 0 THEN ',gres/gpu=' || gpus::VARCHAR || ',gres/gpu:a100=' || gpus::VARCHAR ELSE '' END AS "AllocTRES",
       | 'cpu=' || ${sqlFmtTime("cpu_used")} || ',fs/disk=' || dr::VARCHAR || ',mem=' || mem_used::VARCHAR || 'M'
       |   || CASE WHEN gpus > 0 THEN ',gres/gpumem=' || mem_used::VARCHAR || 'M,gres/gpuutil=' || util::VARCHAR ELSE '' END AS "TRESUsageInTot",
       | 'energy=0,fs/disk=' || dw::VARCHAR AS "TRESUsageOutTot",
       | printf('%d:%d', code, sig) AS "ExitCode"
       | FROM ints""".stripMargin.replaceAll("\n", " ")
  }

  /** `WITH ints AS (…), slurm_raw AS (…)` prefix for every s-query oracle. */
  val sqlPrefix: String = s"WITH ints AS ($intsSql), slurm_raw AS ($rawSql) "
}
