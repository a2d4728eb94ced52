package graft.slurm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's SQL views over the slurm table, as DataFrame
  * transforms (slurm2sql.py:948-987).
  *
  * Spark-first notes: the SQLite `eff` view runs two correlated
  * subqueries per output row (JobName/State from the allocation row);
  * here those become conditional aggregates `max(when(step.isNull, x))`
  * inside the SAME single hash aggregation — one shuffle on
  * JobIDnostep, map-side partial aggregation, no per-row lookups.
  */
object SlurmViews {

  /** SQLite/DuckDB yield NULL on x/0; Spark yields NaN/Inf. The views
    * mirror the reference's SQL semantics. */
  private[slurm] def safeDiv(a: org.apache.spark.sql.Column,
                             b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(b =!= 0, a / b)

  /** `allocations` view: whole-job rows (JobStep IS NULL). */
  def allocations(slurm: DataFrame): DataFrame =
    slurm.filter(col("JobStep").isNull)

  /** `steps` view: job-step rows (JobStep IS NOT NULL). */
  def steps(slurm: DataFrame): DataFrame =
    slurm.filter(col("JobStep").isNotNull)

  /** `eff` view: per-job efficiency rollup, GROUP BY JobIDnostep.
    *
    * `withSubmitLines` (the reference's group_concat(SubmitLine)) is
    * opt-in: collect_list forces an ObjectHashAggregate/sort-based agg
    * and the column is presentation-only — leaving it out keeps the
    * rollup a codegen'd HashAggregate.
    *
    * Skew: every aggregate here is map-side combinable (max/min/sum),
    * so even a pathological array job — 10⁶ steps under ONE
    * JobIDnostep — pre-aggregates to one partial row per map task
    * before the shuffle; the hot reducer key receives ~#tasks rows,
    * not 10⁶ (the rehearsal's hot-job case pins the linear curve).
    * The escape hatch, if a deployment ever adds a non-combinable
    * aggregate (e.g. exact step percentiles): two-phase salting on
    * (JobIDnostep, salt) via [[graft.operators.SkewJoin.saltedCount]]'s
    * shape, or AQE skew-join handling when the rollup feeds a join. */
  def eff(slurm: DataFrame, withSubmitLines: Boolean = false): DataFrame = {
    val isAlloc = col("JobStep").isNull
    val submitLines =
      if (withSubmitLines)
        Seq(concat_ws("\n", collect_list(col("SubmitLine"))).as("SubmitLines"))
      else Seq.empty
    val aggs = Seq(
      max("Partition").as("Partition"),
      max(when(isAlloc, col("JobName"))).as("JobName")) ++ submitLines ++ Seq(
      max("Account").as("Account"),
      max(when(isAlloc, col("State"))).as("State"),
      max("NodeList").as("NodeList"),
      max("Time").as("Time"),
      max("Timelimit").as("TimeLimit"),
      min("Start").as("Start"),
      max("End").as("End"),
      max("NNodes").as("NNodes"),
      max("ReqTRES").as("ReqTRES"),
      max("Elapsed").as("Elapsed"),
      max("NCPUS").as("NCPUS"),
      safeDiv(sum("TotalCPU"), max("CPUTime")).as("CPUeff"),
      max("CPUTime").as("cpu_s_reserved"),
      sum("TotalCPU").as("cpu_s_used"),
      max("ReqMemNode").as("MemReq"),
      max("AllocMem").as("AllocMem"),
      max("TotalMem").as("TotalMem"),
      max("MaxRSS").as("MaxRSS"),
      max("MemEff").as("MemEff"),
      max(col("AllocMem") * col("Elapsed")).as("mem_s_reserved"),
      max("NGpus").as("NGpus"),
      max("GpuType").as("GPUType"),
      (max("NGpus") * max("Elapsed")).as("gpu_s_reserved"),
      (max("NGpus") * max("Elapsed") * max("GpuUtil")).as("gpu_s_used"),
      safeDiv(sum(col("GpuUtil") * col("Elapsed")),
        max(col("NGpus") * col("Elapsed"))).as("GpuEff"),
      max("GpuMem").as("GpuMem"),
      max("MaxDiskRead").as("MaxDiskRead"),
      max("MaxDiskWrite").as("MaxDiskWrite"),
      sum("TotDiskRead").as("TotDiskRead"),
      sum("TotDiskWrite").as("TotDiskWrite"))
    slurm.groupBy(col("JobIDnostep").as("JobID"))
      .agg(max("User").as("User"), aggs: _*)
  }
}
