package graft.slurm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{SlurmFunctions => F}

/** Builds the typed `slurm` table (the reference's COLUMNS schema,
  * slurm2sql.py:580-695) from a raw sacct-string DataFrame.
  *
  * Column-for-column re-expression as Catalyst expressions: every
  * `_`-prefixed computed column in the reference appears here stripped
  * of the underscore, exactly as the SQLite schema does. Missing input
  * columns become NULL (sacct output varies by Slurm version — e.g.
  * ReqGRES vs ReqTRES, slurm2sql.py:316-321).
  */
object SlurmTable {

  /** NULL-safe accessor: raw column if present (empty string → NULL,
    * mirroring the reference's `nullstr`), else NULL. */
  private def in(df: DataFrame, name: String): Column =
    if (df.columns.exists(_.equalsIgnoreCase(name)))
      nullif(col(name).cast("string"), lit(""))
    else lit(null).cast("string")

  /** Derive the full slurm table. `now` = deterministic "current time"
    * epoch for the Time column (reference uses wall-clock; SURVEY §4). */
  def build(raw: DataFrame, now: Column = lit(0L)): DataFrame = {
    val jobId = in(raw, "JobID")
    val submit = F.unixTime(in(raw, "Submit"))
    val start = F.unixTime(in(raw, "Start"))
    val end = F.unixTime(in(raw, "End"))
    val allocTres = in(raw, "AllocTRES")
    val usageIn = in(raw, "TRESUsageInTot")
    val usageOut = in(raw, "TRESUsageOutTot")
    val reqMem = in(raw, "ReqMem")
    val nNodes = in(raw, "NNodes").cast("long")
    val nCpus = in(raw, "NCPUS").cast("long")

    raw.select(
      jobId.as("JobID"),
      F.jobIdNoStep(jobId).as("JobIDnostep"),
      F.jobIdOnly(jobId).as("JobIDonly"),
      F.jobStep(jobId).as("JobStep"),
      F.arrayTaskId(jobId).as("ArrayTaskID"),
      F.jobIdRawOnly(in(raw, "JobIDRaw")).as("JobIDRawonly"),
      in(raw, "JobName").as("JobName"),
      in(raw, "User").as("User"),
      in(raw, "Group").as("Group"),
      in(raw, "Account").as("Account"),
      in(raw, "SubmitLine").as("SubmitLine"),
      F.billing(allocTres).as("Billing"),
      in(raw, "State").as("State"),
      F.slurmTime(in(raw, "Timelimit")).as("Timelimit"),
      F.slurmTime(in(raw, "Elapsed")).as("Elapsed"),
      F.defaultTime(submit, start, end, now).as("Time"),
      submit.as("Submit"),
      start.as("Start"),
      end.as("End"),
      F.queueTime(submit, start).as("QueueTime"),
      in(raw, "Partition").as("Partition"),
      in(raw, "ExitCode").as("ExitCodeRaw"),
      F.exitCode(in(raw, "ExitCode")).as("ExitCode"),
      F.exitSignal(in(raw, "ExitCode")).as("ExitSignal"),
      in(raw, "NodeList").as("NodeList"),
      in(raw, "Priority").cast("long").as("Priority"),
      in(raw, "ConsumedEnergyRaw").cast("long").as("ConsumedEnergy"),
      F.intBytes(in(raw, "ReqNodes")).as("ReqNodes"),
      nNodes.as("NNodes"),
      in(raw, "AllocNodes").cast("long").as("AllocNodes"),
      in(raw, "ReqTRES").as("ReqTRES"),
      in(raw, "NTasks").cast("long").as("NTasks"),
      allocTres.as("AllocTRES"),
      usageIn.as("TRESUsageInTot"),
      // COLUMNS_EXTRA pass-through (slurm2sql.py:694): queried from sacct
      // alongside the schema columns; kept so averaged TRES stats survive
      in(raw, "TRESUsageInAve").as("TRESUsageInAve"),
      usageOut.as("TRESUsageOutTot"),
      nCpus.as("NCPUS"),
      in(raw, "ReqCPUS").cast("long").as("ReqCPUS"),
      in(raw, "AllocCPUS").cast("long").as("AllocCPUS"),
      F.slurmTime(in(raw, "CPUTime")).as("CPUTime"),
      F.slurmTime(F.tresExtract(usageIn, "cpu")).as("TotalCPU"),
      F.slurmTime(in(raw, "UserCPU")).as("UserCPU"),
      F.slurmTime(in(raw, "SystemCPU")).as("SystemCPU"),
      F.cpuEff(in(raw, "Elapsed"), allocTres, usageIn).as("CPUEff"),
      F.slurmTime(in(raw, "MinCPU")).as("MinCPU"),
      in(raw, "MinCPUNode").as("MinCPUNode"),
      in(raw, "MinCPUTask").as("MinCPUTask"),
      F.totalMem(usageIn).as("TotalMem"),
      F.allocMem(allocTres).as("AllocMem"),
      F.memEff(allocTres, usageIn).as("MemEff"),
      // slurmMem rather than float_bytes: tolerates legacy per-node/
      // per-core n/c suffixes the reference would choke on (SURVEY §4)
      F.slurmMem(reqMem).as("ReqMem"),
      F.reqMemNode(reqMem, nNodes, nCpus).as("ReqMemNode"),
      F.reqMemCpu(reqMem, nNodes, nCpus).as("ReqMemCPU"),
      F.slurmMem(in(raw, "AveRSS")).as("AveRSS"),
      F.slurmMem(in(raw, "MaxRSS")).as("MaxRSS"),
      in(raw, "MaxRSSNode").as("MaxRSSNode"),
      in(raw, "MaxRSSTask").as("MaxRSSTask"),
      F.intMetric(in(raw, "MaxPages")).as("MaxPages"),
      F.slurmMem(in(raw, "MaxVMSize")).as("MaxVMSize"),
      F.intBytes(in(raw, "AveDiskRead")).as("AveDiskRead"),
      F.intBytes(in(raw, "AveDiskWrite")).as("AveDiskWrite"),
      F.intBytes(in(raw, "MaxDiskRead")).as("MaxDiskRead"),
      F.intBytes(in(raw, "MaxDiskWrite")).as("MaxDiskWrite"),
      F.totDiskRead(usageIn).as("TotDiskRead"),
      F.totDiskWrite(usageOut).as("TotDiskWrite"),
      F.floatMetric(F.tresExtract(in(raw, "ReqTRES"), "gres/gpu")).as("ReqGPUS"),
      in(raw, "Comment").as("Comment"),
      F.gpuEff(allocTres, usageIn).as("GpuEff"),
      F.nGpus(allocTres).as("NGpus"),
      F.gpuType(allocTres).as("GpuType"),
      F.gpuUtil(usageIn).as("GpuUtil"),
      F.gpuMem(usageIn).as("GpuMem"),
      F.floatMetric(F.tresExtract(usageIn, "gres/gpuutil")).as("GpuUtilTot"),
      F.floatMetric(F.tresExtract(usageIn, "gres/gpumem")).as("GpuMemTot"))
  }
}
