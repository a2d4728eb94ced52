package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Slurm accounting field parsers as pure Catalyst `Column` expressions.
  *
  * Each function re-expresses a converter from the reference
  * (/root/reference/slurm2sql.py) as composed Spark built-ins — no UDFs,
  * so everything stays inside whole-stage codegen and is pushdown-safe.
  * Malformed / empty inputs yield NULL (the reference returns None).
  */
object SlurmFunctions {

  private def nonEmpty(c: Column): Column = when(length(trim(c)) > 0, trim(c))

  /** Parse the Slurm time spec `[dd-[hh:]]mm:ss` (slurm2sql.py:85-107).
    *
    * With a `-`: dd-hh[:mm[:ss]] (anchor from the LEFT).
    * Without: anchored from the RIGHT — `hh:mm:ss`, `mm:ss`, or bare
    * minutes. Seconds may be fractional (`00:15.057`). `UNLIMITED` and
    * `Partition_Limit` → NULL. Returns seconds as DOUBLE.
    *
    * Hot path: native [[SlurmTimeParse]] expression (one pass, codegen).
    * [[slurmTimeComposed]] keeps the built-ins-only form; the two are
    * pinned equivalent by SlurmTimeParseSpec.
    */
  def slurmTime(x: Column): Column = SlurmTimeParse.column(x)

  /** Composed-built-ins form of [[slurmTime]] (reference semantics). */
  def slurmTimeComposed(x: Column): Column = {
    val s = nonEmpty(x)
    val valid = s.isNotNull && !s.isin("UNLIMITED", "Partition_Limit")
    val hasDay = s.contains("-")
    val dayPart = split(s, "-").getItem(0).cast("long")
    val rest = when(hasDay, split(s, "-").getItem(1)).otherwise(s)
    val hms = split(rest, ":")
    val n = size(hms)
    def num(i: Column): Column = element_at(hms, i + 1).cast("double")
    // dd- branch: parts are [hh, mm, ss] from the left
    val dashSecs = dayPart * 86400L +
      when(n >= 1, num(lit(0)) * 3600).otherwise(0.0) +
      when(n >= 2, num(lit(1)) * 60).otherwise(0.0) +
      when(n >= 3, num(lit(2))).otherwise(0.0)
    // no-dash branch: [.. hh, mm, ss] from the right; single field = minutes
    val noDashSecs =
      when(n >= 3, num(n - 3) * 3600).otherwise(0.0) +
      when(n >= 2, num(n - 1) + num(n - 2) * 60)
        .otherwise(num(lit(0)) * 60)
    when(valid, when(hasDay, dashSecs).otherwise(noDashSecs))
  }

  /** Render seconds as a Slurm time string (inverse helper, used by the
    * synthetic slurm source). `d-hh:mm:ss` when days>0 else `hh:mm:ss`. */
  def formatSlurmTime(secs: Column): Column = {
    val t = secs.cast("long")
    def fdiv(a: Column, b: Long): Column = floor(a / b).cast("long")
    val d = fdiv(t, 86400L)
    val h = fdiv(t % 86400L, 3600L)
    val m = fdiv(t % 3600L, 60L)
    val sec = t % 60L
    when(d > 0, format_string("%d-%02d:%02d:%02d", d, h, m, sec))
      .otherwise(format_string("%02d:%02d:%02d", h, m, sec))
  }

  // position of unit char in the slurm unit ladder (k=1, m=2, ...)
  private def locate_index(unitChar: Column): Column =
    instr(lit("kmgtpezy"), lower(unitChar))

  /** `float_bytes` (slurm2sql.py:141-147): number with binary unit suffix
    * (K=1024, M=1024^2, …) → DOUBLE bytes-ish value (reference keeps the
    * raw unit math; K-suffixed sacct values are KiB). */
  def floatBytes(x: Column): Column = {
    val s = nonEmpty(x)
    val last = lower(substring(s, -1, 1))
    val isUnit = instr(lit("kmgtpezy"), last) > 0
    // numeric part: all but last char when unit-suffixed
    val body = when(isUnit, s.substr(lit(1), length(s) - 1)).otherwise(s)
    val mult = when(isUnit, pow(lit(2.0), locate_index(last).cast("double") * 10)).otherwise(lit(1.0))
    body.cast("double") * mult
  }

  /** `int_bytes` (slurm2sql.py:149-151). */
  def intBytes(x: Column): Column = floatBytes(x).cast("long")

  /** `float_metric` (slurm2sql.py:153-160): metric units K=1000 etc. */
  def floatMetric(x: Column): Column = {
    val s = nonEmpty(x)
    val last = lower(substring(s, -1, 1))
    val isUnit = instr(lit("kmgtpezy"), last) > 0
    val body = when(isUnit, s.substr(lit(1), length(s) - 1)).otherwise(s)
    val mult = when(isUnit, pow(lit(1000.0), locate_index(last).cast("double"))).otherwise(lit(1.0))
    body.cast("double") * mult
  }

  /** `int_metric` (slurm2sql.py:162-164). */
  def intMetric(x: Column): Column = floatMetric(x).cast("long")

  /** `slurmmem` (slurm2sql.py:122-127): strip per-node/per-core suffix
    * (`n`/`c`) then binary-unit parse. */
  def slurmMem(x: Column): Column =
    floatBytes(regexp_replace(nonEmpty(x), "[nc]+$", ""))

  /** `unixtime` (slurm2sql.py:67-73): `yyyy-MM-ddTHH:mm:ss` → epoch
    * seconds; `Unknown`/`None`/empty → NULL. Parsed in the session TZ
    * (graft standardizes on UTC — SURVEY.md §4). */
  def unixTime(x: Column): Column = {
    val s = nonEmpty(x)
    when(s.isNotNull && !s.isin("Unknown", "None"),
      to_unix_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss")))
  }

  /** `ExtractField` (slurm2sql.py:178-197): pull `field=value` out of a
    * TRES-style comma-separated string. Returns the raw string value.
    *
    * Hot path: native [[TresExtractExpr]] (single indexOf scan,
    * codegen'd); [[tresExtractComposed]] keeps the regex form the two
    * are spec-pinned against. */
  def tresExtract(c: Column, field: String): Column =
    TresExtractExpr.column(c, field)

  /** Composed regex form of [[tresExtract]]. */
  def tresExtractComposed(c: Column, field: String): Column = {
    val pat = "\\b" + java.util.regex.Pattern.quote(field) + "=([^,]*)"
    nonEmpty(regexp_extract(c, pat, 1))
  }

  // ---- JobID decomposition (slurm2sql.py:409-462) ----
  // JobID forms: JobID[_ArrayTaskID][+HetOffset][.JobStep]

  /** Leading integer of JobID — same for all array tasks / steps. */
  def jobIdOnly(jobId: Column): Column =
    nonEmpty(regexp_extract(jobId, "^([0-9]+)", 1)).cast("long")

  /** JobID without `.step` suffix (keeps `_task`). */
  def jobIdNoStep(jobId: Column): Column =
    nonEmpty(regexp_extract(jobId, "^([0-9]+(_[0-9]+)?)", 1))

  /** Array task ID: digits after `_` (NULL for ranges like `[0-4]`). */
  def arrayTaskId(jobId: Column): Column =
    when(jobId.contains("_") && !jobId.contains("["),
      nonEmpty(regexp_extract(jobId, "_([0-9]+)", 1)).cast("long"))

  /** Job step: everything after the `.` (not necessarily numeric). */
  def jobStep(jobId: Column): Column =
    when(jobId.contains("."), element_at(split(jobId, "\\."), -1))

  /** Leading integer of JobIDRaw (unique per array element). */
  def jobIdRawOnly(jobIdRaw: Column): Column = jobIdOnly(jobIdRaw)

  // ---- Exit code (slurm2sql.py:553-572) ----

  def exitCode(ec: Column): Column =
    split(nonEmpty(ec), ":").getItem(0).cast("int")

  def exitSignal(ec: Column): Column =
    split(nonEmpty(ec), ":").getItem(1).cast("int")

  // ---- Derived per-row metrics ----

  /** `slurmBilling` (slurm2sql.py:255-264): billing= out of AllocTRES. */
  def billing(allocTres: Column): Column =
    nonEmpty(regexp_extract(allocTres, "billing=(\\d+)", 1)).cast("long")

  /** `slurmQueueTime` (slurm2sql.py:246-253): start − submit, seconds. */
  def queueTime(submitTs: Column, startTs: Column): Column =
    when(submitTs.isNotNull && startTs.isNotNull, startTs - submitTs)

  /** `slurmDefaultTime` (slurm2sql.py:205-226): End if known, else `now`
    * if started, else Submit. `now` is a parameter for determinism. */
  def defaultTime(submitTs: Column, startTs: Column, endTs: Column,
                  now: Column): Column =
    when(endTs.isNotNull, endTs)
      .when(startTs.isNotNull, now)
      .otherwise(submitTs)

  /** `slurmMemNode` (slurm2sql.py:267-278): ReqMem per node. Reference
    * quirk: NCPUS==0 → 0, NNodes==0 → NULL. */
  def reqMemNode(reqMem: Column, nNodes: Column, nCpus: Column): Column =
    when(nonEmpty(reqMem).isNotNull,
      when(nCpus === 0, lit(0.0))
        .when(nNodes =!= 0, slurmMem(reqMem) / nNodes))

  /** `slurmMemCPU` (slurm2sql.py:280-291): ReqMem per cpu. */
  def reqMemCpu(reqMem: Column, nNodes: Column, nCpus: Column): Column =
    when(nonEmpty(reqMem).isNotNull && nNodes =!= 0 && nCpus =!= 0,
      slurmMem(reqMem) / nCpus)

  /** `slurmCPUEff` (slurm2sql.py:510-544):
    * TRESUsageInTot[cpu] / (AllocTRES[cpu] × Elapsed). */
  def cpuEff(elapsed: Column, allocTres: Column, tresUsageInTot: Column): Column = {
    val walltime = slurmTime(elapsed)
    val cpuAlloc = intMetric(tresExtract(allocTres, "cpu"))
    val cpuUsed = slurmTime(tresExtract(tresUsageInTot, "cpu"))
    when(walltime.isNotNull && walltime =!= 0.0 &&
         cpuAlloc.isNotNull && cpuAlloc =!= 0L && cpuUsed.isNotNull,
      cpuUsed / (walltime * cpuAlloc))
  }

  /** `slurmMemEff2` (slurm2sql.py:492-508): used/alloc mem from TRES. */
  def memEff(allocTres: Column, tresUsageInTot: Column): Column = {
    val allocMem = floatBytes(tresExtract(allocTres, "mem"))
    val usedMem = floatBytes(tresExtract(tresUsageInTot, "mem"))
    when(allocMem.isNotNull && allocMem =!= 0.0 && usedMem.isNotNull,
      usedMem / allocMem)
  }

  /** `slurmGPUEff2` (slurm2sql.py:395-407):
    * (gpuutil/100) / gres/gpu-count. */
  def gpuEff(allocTres: Column, tresUsageInTot: Column): Column = {
    val gpuAlloc = floatMetric(tresExtract(allocTres, "gres/gpu"))
    val gpuUtil = floatMetric(tresExtract(tresUsageInTot, "gres/gpuutil"))
    when(gpuAlloc.isNotNull && gpuAlloc =!= 0.0 && gpuUtil.isNotNull,
      (gpuUtil / 100.0) / gpuAlloc)
  }

  /** `_NGpus` (slurm2sql.py:681). */
  def nGpus(allocTres: Column): Column =
    floatMetric(tresExtract(allocTres, "gres/gpu"))

  /** `slurmGPUType` (slurm2sql.py:386-393): `gres/gpu:TYPE=`. */
  def gpuType(allocTres: Column): Column =
    nonEmpty(regexp_extract(allocTres, "\\bgres/gpu:([^=]+)=", 1))

  /** `_GpuUtil` (slurm2sql.py:683): gpuutil/100 (can exceed 1 multi-GPU). */
  def gpuUtil(tresUsageInTot: Column): Column =
    floatMetric(tresExtract(tresUsageInTot, "gres/gpuutil")) / 100.0

  /** `_GpuMem` (slurm2sql.py:684). */
  def gpuMem(tresUsageInTot: Column): Column =
    floatMetric(tresExtract(tresUsageInTot, "gres/gpumem"))

  /** `_TotalMem` (slurm2sql.py:652). */
  def totalMem(tresUsageInTot: Column): Column =
    floatBytes(tresExtract(tresUsageInTot, "mem"))

  /** `_AllocMem` (slurm2sql.py:653). */
  def allocMem(allocTres: Column): Column =
    floatBytes(tresExtract(allocTres, "mem"))

  /** `_TotDiskRead`/`_TotDiskWrite` (slurm2sql.py:670-671). */
  def totDiskRead(tresUsageInTot: Column): Column =
    floatBytes(tresExtract(tresUsageInTot, "fs/disk"))
  def totDiskWrite(tresUsageOutTot: Column): Column =
    floatBytes(tresExtract(tresUsageOutTot, "fs/disk"))
}
