package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{SlurmFunctions => F}
import graft.slurm._
import graft.functions.Round.rd

/** Correctness-gate queries s01–s24: every slurm2sql capability from
  * SURVEY.md §2.1-§2.3, exercised over the driver's test tables.
  *
  * Mechanics (SURVEY §5): [[SlurmSim]] builds deterministic sacct-format
  * strings FROM the `orders`/`lineitem` columns; the Spark side parses
  * them back with graft's expressions; the DuckDB oracle computes the
  * expected values arithmetically from the same integers. A hash match
  * proves the parser/view semantics, not the string builder.
  */
object SlurmQueries {

  private val NOW = 1750000000L // deterministic "current time" (SURVEY §4)

  private def raw(s: SparkSession, dir: String) = SlurmSim.raw(s, dir)
  private def table(s: SparkSession, dir: String) =
    SlurmTable.build(SlurmSim.raw(s, dir), lit(NOW))
  private def jsTable(s: SparkSession, dir: String) =
    SlurmTable.build(SlurmSim.jsRaw(s, dir), lit(NOW))

  /** The slurm table MATERIALIZED to parquet once per sfDir (cached
    * across calls), for the s26/s27 warehouse-variant queries: s17/s24
    * time sim-string construction + parse + rollup fused in one pass —
    * the INGEST cost; these time the same rollups the way a deployment
    * actually runs them, over the written warehouse table. The delta
    * between the pairs is the measured value of materializing. */
  private val whCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private lazy val whHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      whCache.values.forEach(p => org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(p)))))
  private def materialized(s: SparkSession, dir: String): DataFrame = {
    val path = whCache.computeIfAbsent(dir, d => {
      whHook
      val p = java.nio.file.Files.createTempDirectory("graft_wh_bench").toString
      jsTable(s, d).write.mode("overwrite").parquet(p)
      p
    })
    s.read.parquet(path)
  }

  /** s17's projection of the eff view (shared by the warehouse twin). */
  private def effProjection(eff: DataFrame): DataFrame =
    eff.select(
      col("JobID").as("jobid"), col("User").as("user_name"),
      col("JobName").as("jobname"), col("Account").as("account"),
      col("State").as("state"), col("Time").as("time_ts"),
      col("TimeLimit").as("timelimit_s"), col("Start").as("start_ts"),
      col("End").as("end_ts"), col("NNodes").as("nnodes"),
      col("Elapsed").as("elapsed_s"), col("NCPUS").as("ncpus"),
      col("CPUeff").as("cpueff"), col("cpu_s_reserved"),
      col("cpu_s_used"), col("MemReq").as("memreq_b"),
      col("AllocMem").as("allocmem_b"), col("TotalMem").as("totalmem_b"),
      col("MemEff").as("memeff"), col("mem_s_reserved"),
      col("NGpus").as("ngpus"), col("GPUType").as("gputype"),
      col("gpu_s_reserved"), rd(col("gpu_s_used"), 6).as("gpu_s_used"),
      rd(col("GpuEff"), 6).as("gpueff"), col("GpuMem").as("gpumem_b"),
      col("TotDiskRead").as("totdiskread_b"),
      col("TotDiskWrite").as("totdiskwrite_b"))
      .orderBy("jobid")

  /** s24's projection of the per-user report (shared by the twin). */
  private def seffUserProjection(eff: DataFrame): DataFrame =
    Reports.seffPerUser(eff).select(
      col("User").as("user_name"), col("days"), col("cpu_day"),
      col("cpueff_pct"), col("mem_GiB_day").as("mem_gib_day"),
      col("gpu_day"), col("gpueff_pct"),
      col("read_MiBps").as("read_mibps"), col("write_MiBps").as("write_mibps"))
      .orderBy("user_name")

  private val P = SlurmSim.sqlPrefix
  private val UNITF = "(CASE k % 3 WHEN 0 THEN 1024.0 WHEN 1 THEN 1048576.0 ELSE 1073741824.0 END)"
  private val PART = "(CASE k % 4 WHEN 0 THEN 'batch' WHEN 1 THEN 'gpu' WHEN 2 THEN 'interactive' ELSE 'long' END)"
  private val STATE = "(CASE WHEN m11 = 0 THEN 'RUNNING' WHEN code = 0 THEN 'COMPLETED' ELSE 'FAILED' END)"
  private val JOBID = "(CASE m4 WHEN 0 THEN k::VARCHAR WHEN 1 THEN printf('%d_%d', k, arr) WHEN 2 THEN printf('%d.%d', k, stp) ELSE printf('%d_%d.%d', k, arr, stp) END)"
  private val BASE = "(epoch(d)::BIGINT + subsec)" // submit epoch

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_slurmtime" -> ((s, dir) => {
      val r = raw(s, dir)
      r.select(col("k"),
        F.slurmTime(col("Elapsed")).as("elapsed_s"),
        F.slurmTime(col("Timelimit")).as("timelimit_s"),
        F.slurmTime(F.tresExtract(col("TRESUsageInTot"), "cpu")).as("cpu_used_s"))
        .orderBy("k")
    }),
    "s02_bytes_binary" -> ((s, dir) => {
      val r = raw(s, dir)
      r.select(col("k"),
        F.floatBytes(F.tresExtract(col("AllocTRES"), "mem")).as("mem_alloc_b"),
        F.intBytes(F.tresExtract(col("AllocTRES"), "mem")).as("mem_alloc_bi"),
        F.floatBytes(F.tresExtract(col("TRESUsageInTot"), "fs/disk")).as("disk_read_b"))
        .orderBy("k")
    }),
    "s03_metric_units" -> ((s, dir) => {
      val r = raw(s, dir)
      r.select(col("k"),
        F.intMetric(F.tresExtract(col("AllocTRES"), "cpu")).as("cpus_n"),
        F.floatMetric(F.tresExtract(col("TRESUsageInTot"), "gres/gpuutil")).as("util_m"),
        F.floatMetric(F.tresExtract(col("TRESUsageInTot"), "gres/gpumem")).as("gpumem_m"))
        .orderBy("k")
    }),
    "s04_slurmmem" -> ((s, dir) =>
      raw(s, dir).select(col("k"),
        F.slurmMem(col("ReqMem")).as("reqmem_b")).orderBy("k")),
    "s05_unixtime" -> ((s, dir) =>
      raw(s, dir).select(col("k"),
        F.unixTime(col("Submit")).as("submit_ts"),
        F.unixTime(col("Start")).as("start_ts"),
        F.unixTime(col("End")).as("end_ts")).orderBy("k")),
    "s06_tres_extract" -> ((s, dir) =>
      raw(s, dir).select(col("k"),
        F.tresExtract(col("AllocTRES"), "mem").as("mem_s"),
        F.tresExtract(col("AllocTRES"), "cpu").as("cpu_s"),
        F.tresExtract(col("AllocTRES"), "gres/gpu").as("gpu_s"),
        F.tresExtract(col("AllocTRES"), "billing").as("billing_s"),
        F.tresExtract(col("TRESUsageInTot"), "fs/disk").as("disk_in_s"),
        F.tresExtract(col("TRESUsageOutTot"), "fs/disk").as("disk_out_s"))
        .orderBy("k")),
    "s07_jobid_parse" -> ((s, dir) =>
      raw(s, dir).select(col("k"),
        F.jobIdOnly(col("JobID")).as("id_only"),
        F.jobIdNoStep(col("JobID")).as("id_nostep"),
        F.arrayTaskId(col("JobID")).as("array_task"),
        F.jobStep(col("JobID")).as("job_step"),
        F.jobIdRawOnly(col("JobIDRaw")).as("id_raw_only")).orderBy("k")),
    "s08_exitcode" -> ((s, dir) =>
      raw(s, dir).select(col("k"),
        F.exitCode(col("ExitCode")).as("exit_code"),
        F.exitSignal(col("ExitCode")).as("exit_signal")).orderBy("k")),
    "s09_mem_derived" -> ((s, dir) =>
      raw(s, dir).select(col("k"),
        F.reqMemNode(col("ReqMem"), col("NNodes"), col("NCPUS")).as("memnode_b"),
        F.reqMemCpu(col("ReqMem"), col("NNodes"), col("NCPUS")).as("memcpu_b"))
        .orderBy("k")),
    "s10_queue_billing" -> ((s, dir) =>
      raw(s, dir).select(col("k"),
        F.queueTime(F.unixTime(col("Submit")), F.unixTime(col("Start"))).as("queue_s"),
        F.billing(col("AllocTRES")).as("billing_n")).orderBy("k")),
    "s11_cpueff" -> ((s, dir) =>
      raw(s, dir).select(col("k"),
        F.cpuEff(col("Elapsed"), col("AllocTRES"), col("TRESUsageInTot")).as("cpu_eff"))
        .orderBy("k")),
    "s12_memeff" -> ((s, dir) =>
      raw(s, dir).select(col("k"),
        F.memEff(col("AllocTRES"), col("TRESUsageInTot")).as("mem_eff"))
        .orderBy("k")),
    "s13_gpueff" -> ((s, dir) =>
      raw(s, dir).select(col("k"),
        F.gpuEff(col("AllocTRES"), col("TRESUsageInTot")).as("gpu_eff"),
        F.nGpus(col("AllocTRES")).as("ngpus"),
        F.gpuType(col("AllocTRES")).as("gpu_type"),
        F.gpuUtil(col("TRESUsageInTot")).as("gpu_util")).orderBy("k")),
    "s14_defaulttime" -> ((s, dir) =>
      raw(s, dir).select(col("k"),
        F.defaultTime(F.unixTime(col("Submit")), F.unixTime(col("Start")),
          F.unixTime(col("End")), lit(NOW)).as("time_ts")).orderBy("k")),
    "s15_sacct_ingest" -> ((s, dir) => {
      val t = table(s, dir)
      t.select(col("JobIDonly").as("k"),
        col("JobID").as("jobid"), col("JobIDnostep").as("jobid_nostep"),
        col("JobIDonly").as("jobid_only"), col("JobStep").as("job_step"),
        col("ArrayTaskID").as("array_task"), col("User").as("user_name"),
        col("Partition").as("partition"), col("State").as("state"),
        col("Timelimit").as("timelimit_s"), col("Elapsed").as("elapsed_s"),
        col("Time").as("time_ts"), col("Submit").as("submit_ts"),
        col("Start").as("start_ts"), col("End").as("end_ts"),
        col("QueueTime").as("queue_s"), col("ExitCode").as("exit_code"),
        col("ExitSignal").as("exit_signal"), col("NNodes").as("nnodes"),
        col("NCPUS").as("ncpus"), col("Billing").as("billing_n"),
        col("AllocMem").as("alloc_mem_b"), col("TotalMem").as("total_mem_b"),
        col("CPUEff").as("cpu_eff"), col("MemEff").as("mem_eff"),
        col("NGpus").as("ngpus"), col("GpuType").as("gpu_type"),
        col("GpuEff").as("gpu_eff"), col("TotDiskRead").as("disk_in_b"),
        col("TotDiskWrite").as("disk_out_b"),
        col("ReqMem").as("reqmem_b"), col("ReqMemNode").as("memnode_b"))
        .orderBy("k")
    }),
    "s16_allocations_steps" -> ((s, dir) => {
      val t = table(s, dir)
      val isAlloc = col("JobStep").isNull
      t.groupBy(col("Partition").as("partition")).agg(
        sum(when(isAlloc, 1L).otherwise(0L)).as("n_alloc"),
        sum(when(isAlloc, 0L).otherwise(1L)).as("n_steps"),
        sum(when(isAlloc, col("NCPUS"))).as("alloc_cpus"))
        .orderBy("partition")
    }),
    "s17_eff_view" -> ((s, dir) =>
      effProjection(SlurmViews.eff(jsTable(s, dir)))),
    // the same eff rollup over the MATERIALIZED warehouse table — what
    // a deployment actually pays per query (the sim parse is the
    // ingest, paid once at load)
    "s26_eff_warehouse" -> ((s, dir) =>
      effProjection(SlurmViews.eff(materialized(s, dir)))),
    "s27_seff_warehouse" -> ((s, dir) =>
      seffUserProjection(SlurmViews.eff(materialized(s, dir)))),
    "s18_update_dedup" -> ((s, dir) => {
      val r0 = raw(s, dir)
      val r1 = r0.filter(col("k") % 2 === 0).withColumn("State", lit("RESUBMIT"))
      IncrementalLoad.upsert(Seq(r0, r1))
        .select(col("k"), col("JobID").as("jobid"), col("State").as("state"),
          F.slurmTime(col("Elapsed")).as("elapsed_s"),
          col("User").as("user_name"))
        .orderBy("k")
    }),
    "s19_jobs_only" -> ((s, dir) => {
      val t = table(s, dir).filter(col("JobStep").isNull) // --jobs-only
      t.groupBy(col("Partition").as("partition")).agg(
        count(lit(1)).as("n_jobs"),
        sum(col("NCPUS")).as("sum_cpus"),
        rd(avg(col("Elapsed")), 4).as("avg_elapsed_s"))
        .orderBy("partition")
    }),
    "s20_history_batch" -> ((s, dir) =>
      HistoryLoader.dayBatches(Tables.load(s, dir, "events")).orderBy("batch_day")),
    "s21_deidentify" -> ((s, dir) =>
      Deidentify.relabel(raw(s, dir).select(col("k"), col("JobID").as("jobid"),
        col("User")), "User")
        .select(col("k"), col("jobid"), col("User").as("user_name"))
        .orderBy("k")),
    "s22_sacct_report" -> ((s, dir) =>
      Reports.sacct(table(s, dir), user = Some("user_7"), partition = None)
        .unionByName(Reports.sacct(table(s, dir), user = None, partition = Some("gpu"))
          .filter(col("User") =!= "user_7"))
        .select(col("JobID").as("jobid"), col("User").as("user_name"),
          col("State").as("state"), col("Start").as("start_ts"),
          col("End").as("end_ts"), col("NCPUS").as("ncpus"),
          col("Elapsed").as("elapsed_s"), col("AllocMem").as("alloc_mem_b"),
          col("CPUEff").as("cpu_eff"))
        .orderBy("jobid")),
    "s23_seff_perjob" -> ((s, dir) =>
      Reports.seffPerJob(SlurmViews.eff(jsTable(s, dir))).select(
        col("JobID").as("jobid"), col("User").as("user_name"),
        col("hours"), col("ST").as("st"), col("NCPUS").as("ncpus"),
        col("CPUeff").as("cpueff"),
        col("MemAllocGiB").as("memallocgib"), col("MemTotGiB").as("memtotgib"),
        col("MemEff").as("memeff"), col("NGpus").as("ngpus"),
        rd(col("GpuEff"), 6).as("gpueff"),
        col("read_MiBps").as("read_mibps"), col("write_MiBps").as("write_mibps"))
        .orderBy("jobid")),
    "s24_seff_peruser" -> ((s, dir) =>
      seffUserProjection(SlurmViews.eff(jsTable(s, dir)))),
    // State-category selectors (--ended/--completed/--cancelled/--failed/
    // --running-at-time, slurm2sql.py:1156-1160,1192-1203): a 10-way
    // synthetic state built from k covers every code in the categories
    // (incl. the 'CANCELLED by uid' form); the oracle classifies each k
    // arithmetically from the reference's code sets, so a hash match
    // proves graft's category mapping.
    "s25_state_report" -> ((s, dir) => {
      val r = raw(s, dir)
      val state = expr(
        """CASE k % 10 WHEN 0 THEN 'COMPLETED' WHEN 1 THEN 'CANCELLED by 123'
          | WHEN 2 THEN 'FAILED' WHEN 3 THEN 'TIMEOUT' WHEN 4 THEN 'NODE_FAIL'
          | WHEN 5 THEN 'OUT_OF_MEMORY' WHEN 6 THEN 'RUNNING'
          | WHEN 7 THEN 'PREEMPTED' WHEN 8 THEN 'DEADLINE'
          | ELSE 'REVOKED' END""".stripMargin.replaceAll("\n", " "))
      val base = r.select(col("k"), state.as("State"),
        F.unixTime(col("Start")).as("Start"), F.unixTime(col("End")).as("End"),
        col("User"), col("Partition"))
      base.select(col("k"), col("State").as("state"),
        SlurmStates.inCategory(col("State"), SlurmStates.ENDED).cast("int").as("is_ended"),
        SlurmStates.inCategory(col("State"), SlurmStates.COMPLETED).cast("int").as("is_completed"),
        SlurmStates.inCategory(col("State"), SlurmStates.CANCELLED).cast("int").as("is_cancelled"),
        SlurmStates.inCategory(col("State"), SlurmStates.FAILED).cast("int").as("is_failed"),
        (col("Start") <= RUN_T && (col("End").isNull || col("End") > RUN_T))
          .cast("int").as("was_running_at_t"))
        .orderBy("k")
    })
  )

  /** --running-at-time probe instant for s25 (mid-range of the synthetic
    * submit epochs derived from the TPC-H order dates). */
  private val RUN_T = 800000000L

  // ---------------- oracles ----------------

  /** Analytic eff-view expectation: ints + per-order step aggregates.
    * Mirrors SlurmViews.eff outputs formula-by-formula (SURVEY §2.2). */
  private val EFFCTE: String = {
    val sl = """SELECT l_orderkey AS k, l_linenumber::BIGINT AS ln,
      | (l_orderkey * 37) % 400000 AS e,
      | 1 + l_orderkey % 64 AS cpus,
      | 256 * (1 + l_orderkey % 32) AS memmb,
      | l_orderkey % 100 AS pct,
      | l_orderkey % 5 AS gpus
      | FROM lineitem""".stripMargin.replaceAll("\n", " ")
    val sx = """SELECT k, ln, gpus,
      | (e * (100 - ln)) // 100 AS se,
      | (((e * (100 - ln)) // 100) * cpus * pct) // 100 AS cu,
      | (memmb * ((k + ln) % 90)) // 100 AS mu,
      | ((k + ln) % 5) * 25 AS utls,
      | (k * ln) % 100000 AS drln,
      | (k * ln) % 70000 AS dwln
      | FROM sl""".stripMargin.replaceAll("\n", " ")
    val sagg = """SELECT k,
      | sum(cu::DOUBLE) AS cpu_used_sum,
      | max(se) AS se_max,
      | max(mu) AS mu_max,
      | max(utls) AS util_max,
      | sum((utls::DOUBLE / 100.0) * se::DOUBLE) AS gpuutil_elapsed_sum,
      | sum(drln::DOUBLE) AS dr_sum,
      | sum(dwln::DOUBLE) AS dw_sum
      | FROM sx GROUP BY k""".stripMargin.replaceAll("\n", " ")
    val eff = s"""SELECT
      | CASE WHEN i.m4 % 2 = 1 THEN printf('%d_%d', i.k, i.arr) ELSE i.k::VARCHAR END AS jobid,
      | 'user_' || i.uid::VARCHAR AS user_name,
      | 'job_' || i.k::VARCHAR AS jobname,
      | 'acct_' || (i.k % 5)::VARCHAR AS account,
      | CASE WHEN i.m11 = 0 THEN 'RUNNING' WHEN i.code = 0 THEN 'COMPLETED' ELSE 'FAILED' END AS state,
      | CASE WHEN i.m11 = 0 THEN 1750000000 ELSE epoch(i.d)::BIGINT + i.subsec + i.qsec + i.e END AS time_ts,
      | CASE WHEN i.m13 = 0 THEN NULL ELSE (i.tlmin * 60)::DOUBLE END AS timelimit_s,
      | epoch(i.d)::BIGINT + i.subsec + i.qsec AS start_ts,
      | CASE WHEN i.m11 = 0 THEN epoch(i.d)::BIGINT + i.subsec + i.qsec + s.se_max
      |      ELSE epoch(i.d)::BIGINT + i.subsec + i.qsec + i.e END AS end_ts,
      | i.nnodes AS nnodes,
      | i.e::DOUBLE AS elapsed_s,
      | i.cpus AS ncpus,
      | CASE WHEN i.e * i.cpus = 0 THEN NULL ELSE s.cpu_used_sum / ((i.e * i.cpus)::DOUBLE) END AS cpueff,
      | (i.e * i.cpus)::DOUBLE AS cpu_s_reserved,
      | s.cpu_used_sum AS cpu_s_used,
      | (i.amt * ${UNITF.replace("CASE k", "CASE i.k")}) / i.nnodes AS memreq_b,
      | i.memmb * 1048576.0 AS allocmem_b,
      | s.mu_max * 1048576.0 AS totalmem_b,
      | (s.mu_max * 1048576.0) / (i.memmb * 1048576.0) AS memeff,
      | (i.memmb * 1048576.0) * (i.e::DOUBLE) AS mem_s_reserved,
      | CASE WHEN i.gpus > 0 THEN i.gpus::DOUBLE END AS ngpus,
      | CASE WHEN i.gpus > 0 THEN 'a100' END AS gputype,
      | CASE WHEN i.gpus > 0 THEN i.gpus::DOUBLE * (i.e::DOUBLE) END AS gpu_s_reserved,
      | CASE WHEN i.gpus > 0 THEN i.gpus::DOUBLE * (i.e::DOUBLE) * (s.util_max::DOUBLE / 100.0) END AS gpu_s_used,
      | CASE WHEN i.gpus > 0 AND i.gpus * i.e != 0 THEN s.gpuutil_elapsed_sum / (i.gpus::DOUBLE * (i.e::DOUBLE)) END AS gpueff,
      | CASE WHEN i.gpus > 0 THEN s.mu_max * 1000000.0 END AS gpumem_b,
      | s.dr_sum AS totdiskread_b,
      | s.dw_sum AS totdiskwrite_b
      | FROM ints i LEFT JOIN sagg s ON s.k = i.k""".stripMargin.replaceAll("\n", " ")
    s"$P, sl AS ($sl), sx AS ($sx), sagg AS ($sagg), eff AS ($eff) "
  }

  // lazy: oraclesBase is declared below (object-init order)
  lazy val oracles: Map[String, String] = oraclesBase +
    // warehouse twins compute the SAME result as their parse-fused
    // originals — the parquet round-trip must be lossless
    ("s26_eff_warehouse" -> oraclesBase("s17_eff_view")) +
    ("s27_seff_warehouse" -> oraclesBase("s24_seff_peruser"))

  private val oraclesBase: Map[String, String] = Map(
    "s01_slurmtime" ->
      (P + s"SELECT k, e::DOUBLE AS elapsed_s, CASE WHEN m13 = 0 THEN NULL ELSE (tlmin * 60)::DOUBLE END AS timelimit_s, cpu_used::DOUBLE AS cpu_used_s FROM ints ORDER BY k"),
    "s02_bytes_binary" ->
      (P + "SELECT k, memmb * 1048576.0 AS mem_alloc_b, (memmb * 1048576.0)::BIGINT AS mem_alloc_bi, dr::DOUBLE AS disk_read_b FROM ints ORDER BY k"),
    "s03_metric_units" ->
      (P + "SELECT k, cpus AS cpus_n, CASE WHEN gpus > 0 THEN util::DOUBLE END AS util_m, CASE WHEN gpus > 0 THEN mem_used * 1000000.0 END AS gpumem_m FROM ints ORDER BY k"),
    "s04_slurmmem" ->
      (P + s"SELECT k, amt * $UNITF AS reqmem_b FROM ints ORDER BY k"),
    "s05_unixtime" ->
      (P + s"SELECT k, $BASE AS submit_ts, $BASE + qsec AS start_ts, CASE WHEN m11 = 0 THEN NULL ELSE $BASE + qsec + e END AS end_ts FROM ints ORDER BY k"),
    "s06_tres_extract" ->
      (P + "SELECT k, memmb::VARCHAR || 'M' AS mem_s, cpus::VARCHAR AS cpu_s, CASE WHEN gpus > 0 THEN gpus::VARCHAR END AS gpu_s, bill::VARCHAR AS billing_s, dr::VARCHAR AS disk_in_s, dw::VARCHAR AS disk_out_s FROM ints ORDER BY k"),
    "s07_jobid_parse" ->
      (P + "SELECT k, k AS id_only, CASE WHEN m4 IN (1,3) THEN printf('%d_%d', k, arr) ELSE k::VARCHAR END AS id_nostep, CASE WHEN m4 IN (1,3) THEN arr END AS array_task, CASE WHEN m4 IN (2,3) THEN stp::VARCHAR END AS job_step, k AS id_raw_only FROM ints ORDER BY k"),
    "s08_exitcode" ->
      (P + "SELECT k, code::INTEGER AS exit_code, sig::INTEGER AS exit_signal FROM ints ORDER BY k"),
    "s09_mem_derived" ->
      (P + s"SELECT k, (amt * $UNITF) / nnodes AS memnode_b, (amt * $UNITF) / cpus AS memcpu_b FROM ints ORDER BY k"),
    "s10_queue_billing" ->
      (P + "SELECT k, qsec AS queue_s, bill AS billing_n FROM ints ORDER BY k"),
    "s11_cpueff" ->
      (P + "SELECT k, CASE WHEN e = 0 THEN NULL ELSE (cpu_used::DOUBLE) / ((e::DOUBLE) * cpus) END AS cpu_eff FROM ints ORDER BY k"),
    "s12_memeff" ->
      (P + "SELECT k, (mem_used * 1048576.0) / (memmb * 1048576.0) AS mem_eff FROM ints ORDER BY k"),
    "s13_gpueff" ->
      (P + "SELECT k, CASE WHEN gpus > 0 THEN (util::DOUBLE / 100.0) / gpus END AS gpu_eff, CASE WHEN gpus > 0 THEN gpus::DOUBLE END AS ngpus, CASE WHEN gpus > 0 THEN 'a100' END AS gpu_type, CASE WHEN gpus > 0 THEN util::DOUBLE / 100.0 END AS gpu_util FROM ints ORDER BY k"),
    "s14_defaulttime" ->
      (P + s"SELECT k, CASE WHEN m11 = 0 THEN 1750000000 ELSE $BASE + qsec + e END AS time_ts FROM ints ORDER BY k"),
    "s15_sacct_ingest" ->
      (P + s"""SELECT k, $JOBID AS jobid,
        | CASE WHEN m4 IN (1,3) THEN printf('%d_%d', k, arr) ELSE k::VARCHAR END AS jobid_nostep,
        | k AS jobid_only,
        | CASE WHEN m4 IN (2,3) THEN stp::VARCHAR END AS job_step,
        | CASE WHEN m4 IN (1,3) THEN arr END AS array_task,
        | 'user_' || uid::VARCHAR AS user_name, $PART AS "partition", $STATE AS state,
        | CASE WHEN m13 = 0 THEN NULL ELSE (tlmin * 60)::DOUBLE END AS timelimit_s,
        | e::DOUBLE AS elapsed_s,
        | CASE WHEN m11 = 0 THEN 1750000000 ELSE $BASE + qsec + e END AS time_ts,
        | $BASE AS submit_ts, $BASE + qsec AS start_ts,
        | CASE WHEN m11 = 0 THEN NULL ELSE $BASE + qsec + e END AS end_ts,
        | qsec AS queue_s, code::INTEGER AS exit_code, sig::INTEGER AS exit_signal,
        | nnodes, cpus AS ncpus, bill AS billing_n,
        | memmb * 1048576.0 AS alloc_mem_b, mem_used * 1048576.0 AS total_mem_b,
        | CASE WHEN e = 0 THEN NULL ELSE (cpu_used::DOUBLE) / ((e::DOUBLE) * cpus) END AS cpu_eff,
        | (mem_used * 1048576.0) / (memmb * 1048576.0) AS mem_eff,
        | CASE WHEN gpus > 0 THEN gpus::DOUBLE END AS ngpus,
        | CASE WHEN gpus > 0 THEN 'a100' END AS gpu_type,
        | CASE WHEN gpus > 0 THEN (util::DOUBLE / 100.0) / gpus END AS gpu_eff,
        | dr::DOUBLE AS disk_in_b, dw::DOUBLE AS disk_out_b,
        | amt * $UNITF AS reqmem_b, (amt * $UNITF) / nnodes AS memnode_b
        | FROM ints ORDER BY k""".stripMargin.replaceAll("\n", " ")),
    "s16_allocations_steps" ->
      (P + s"""SELECT $PART AS "partition", sum(CASE WHEN m4 IN (0,1) THEN 1 ELSE 0 END)::BIGINT AS n_alloc, sum(CASE WHEN m4 IN (0,1) THEN 0 ELSE 1 END)::BIGINT AS n_steps, sum(CASE WHEN m4 IN (0,1) THEN cpus END)::BIGINT AS alloc_cpus FROM ints GROUP BY 1 ORDER BY 1"""),
    "s17_eff_view" ->
      (EFFCTE + """SELECT jobid, user_name, jobname, account, state, time_ts,
        | timelimit_s, start_ts, end_ts, nnodes, elapsed_s, ncpus, cpueff,
        | cpu_s_reserved, cpu_s_used, memreq_b, allocmem_b, totalmem_b,
        | memeff, mem_s_reserved, ngpus, gputype, gpu_s_reserved,
        | round(gpu_s_used, 6) AS gpu_s_used, round(gpueff, 6) AS gpueff,
        | gpumem_b, totdiskread_b, totdiskwrite_b
        | FROM eff ORDER BY jobid""".stripMargin.replaceAll("\n", " ")),
    "s18_update_dedup" ->
      (P + s"SELECT k, $JOBID AS jobid, CASE WHEN k % 2 = 0 THEN 'RESUBMIT' ELSE $STATE END AS state, e::DOUBLE AS elapsed_s, 'user_' || uid::VARCHAR AS user_name FROM ints ORDER BY k"),
    "s19_jobs_only" ->
      (P + s"""SELECT $PART AS "partition", count(*) AS n_jobs, sum(cpus)::BIGINT AS sum_cpus, round(avg(e::DOUBLE), 4) AS avg_elapsed_s FROM ints WHERE m4 IN (0,1) GROUP BY 1 ORDER BY 1"""),
    "s20_history_batch" ->
      "SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS batch_day, count(*) AS n_rows, floor(epoch(max(ts)))::BIGINT AS last_timestamp FROM events GROUP BY 1 ORDER BY 1",
    "s21_deidentify" ->
      (P + s"SELECT k, $JOBID AS jobid, 'User_' || (dense_rank() OVER (ORDER BY 'user_' || uid::VARCHAR) - 1)::VARCHAR AS user_name FROM ints ORDER BY k"),
    "s22_sacct_report" ->
      (P + s"""SELECT $JOBID AS jobid, 'user_' || uid::VARCHAR AS user_name, $STATE AS state,
        | $BASE + qsec AS start_ts,
        | CASE WHEN m11 = 0 THEN NULL ELSE $BASE + qsec + e END AS end_ts,
        | cpus AS ncpus, e::DOUBLE AS elapsed_s, memmb * 1048576.0 AS alloc_mem_b,
        | CASE WHEN e = 0 THEN NULL ELSE (cpu_used::DOUBLE) / ((e::DOUBLE) * cpus) END AS cpu_eff
        | FROM ints WHERE uid = 7 OR k % 4 = 1 ORDER BY jobid""".stripMargin.replaceAll("\n", " ")),
    "s23_seff_perjob" ->
      (EFFCTE + """SELECT jobid, user_name,
        | round(elapsed_s / 3600, 2) AS hours,
        | substr(state, 1, 2) AS st, ncpus, cpueff,
        | round(allocmem_b / 1073741824, 2) AS memallocgib,
        | round(totalmem_b / 1073741824, 2) AS memtotgib,
        | memeff, ngpus, round(gpueff, 6) AS gpueff,
        | round(totdiskread_b / elapsed_s / 1048576, 2) AS read_mibps,
        | round(totdiskwrite_b / elapsed_s / 1048576, 2) AS write_mibps
        | FROM eff WHERE end_ts IS NOT NULL
        | ORDER BY jobid""".stripMargin.replaceAll("\n", " ")),
    "s24_seff_peruser" ->
      (EFFCTE + """SELECT user_name,
        | round(sum(elapsed_s) / 86400, 1) AS days,
        | round(sum(elapsed_s * ncpus) / 86400, 1) AS cpu_day,
        | round(sum(elapsed_s * ncpus * cpueff) / sum(elapsed_s * ncpus) * 100, 4) AS cpueff_pct,
        | round(sum(elapsed_s * allocmem_b) / 1073741824 / 86400, 1) AS mem_gib_day,
        | round(sum(elapsed_s * ngpus) / 86400, 1) AS gpu_day,
        | round(sum(elapsed_s * ngpus * gpueff) / sum(elapsed_s * ngpus) * 100, 4) AS gpueff_pct,
        | round(sum(totdiskread_b / 1048576) / sum(elapsed_s), 2) AS read_mibps,
        | round(sum(totdiskwrite_b / 1048576) / sum(elapsed_s), 2) AS write_mibps
        | FROM eff WHERE end_ts IS NOT NULL GROUP BY user_name
        | ORDER BY user_name""".stripMargin.replaceAll("\n", " ")),
    // classifies each k straight from the reference's category code sets
    // (ENDED/COMPLETED/CANCELLED/FAILED, slurm2sql.py:1156-1160) — the
    // Spark side must reach the same flags via state-NAME matching
    "s25_state_report" ->
      (P + s"""SELECT k,
        | CASE k % 10 WHEN 0 THEN 'COMPLETED' WHEN 1 THEN 'CANCELLED by 123'
        |  WHEN 2 THEN 'FAILED' WHEN 3 THEN 'TIMEOUT' WHEN 4 THEN 'NODE_FAIL'
        |  WHEN 5 THEN 'OUT_OF_MEMORY' WHEN 6 THEN 'RUNNING'
        |  WHEN 7 THEN 'PREEMPTED' WHEN 8 THEN 'DEADLINE' ELSE 'REVOKED' END AS state,
        | CASE WHEN k % 10 != 6 THEN 1 ELSE 0 END AS is_ended,
        | CASE WHEN k % 10 = 0 THEN 1 ELSE 0 END AS is_completed,
        | CASE WHEN k % 10 IN (1, 8) THEN 1 ELSE 0 END AS is_cancelled,
        | CASE WHEN k % 10 IN (2, 3, 4, 5) THEN 1 ELSE 0 END AS is_failed,
        | CASE WHEN $BASE + qsec <= 800000000
        |   AND (m11 = 0 OR $BASE + qsec + e > 800000000)
        |  THEN 1 ELSE 0 END AS was_running_at_t
        | FROM ints ORDER BY k""".stripMargin.replaceAll("\n", " "))
  )
}
