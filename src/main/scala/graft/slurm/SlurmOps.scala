package graft.slurm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Round.rd

/** Update/upsert semantics of the reference's `INSERT OR REPLACE`
  * (slurm2sql.py:1023-1027): later loads replace earlier rows with the
  * same JobID. Spark-first: tag each load, one window per key, keep the
  * newest — a single shuffle on the key, no row-at-a-time writes. */
object IncrementalLoad {
  def upsert(loads: Seq[DataFrame], key: String = "JobID"): DataFrame = {
    val tagged = loads.zipWithIndex.map { case (df, i) =>
      df.withColumn("_load_seq", lit(i))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col(key)).orderBy(col("_load_seq").desc)
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_load_seq")
  }
}

/** Day-by-day history collection (slurm2sql.py:791-851): the reference
  * loops `sacct -S day -E day+1`; at scale the same batching is a
  * date_trunc bucketing of one scan, and the resume bookmark
  * (meta_slurm_lastupdate, slurm2sql.py:1104-1120) is max(ts). */
object HistoryLoader {
  /** Per-day batch summary + the resume timestamp each batch would
    * persist (max event ts seen so far ≤ batch end). */
  def dayBatches(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events.groupBy(date_format(date_trunc("day", col(tsCol)), "yyyy-MM-dd").as("batch_day"))
      .agg(
        count(lit(1)).as("n_rows"),
        floor(unix_timestamp(max(col(tsCol)))).cast("long").as("last_timestamp"))

  /** Rows newer than the persisted resume timestamp (--history-resume). */
  def resumeFrom(events: DataFrame, lastTs: Long, tsCol: String = "ts"): DataFrame =
    events.filter(unix_timestamp(col(tsCol)) > lastTs)
}

/** deidentify.py re-expressed: replace each distinct value of a column
  * with `<col>_<i>`, index = the value's position in global sort order
  * (deterministic under parallelism, unlike the reference's first-seen
  * row order; deidentify.py:27-46).
  *
  * Scale shape (columns like JobName/SubmitLine are near-unique, so the
  * mapping is the same order of magnitude as the data):
  *  - global rank is assembled distributively: range-partition the
  *    distinct values (partition i's values all sort before partition
  *    i+1's), row_number within each partition, plus a per-partition
  *    offset — the only global-order step runs on ≤ numPartitions count
  *    rows, never on the values themselves;
  *  - the mapping joins back by a plain shuffle join (no broadcast
  *    hint — a near-unique column's mapping doesn't fit on executors;
  *    AQE still auto-broadcasts genuinely small mappings). */
object Deidentify {
  /** Reference default column set (deidentify.py:7). */
  val DEFAULT_COLUMNS: Seq[String] =
    Seq("JobName", "User", "Group", "SubmitLine", "Comment")

  /** Relabel every identifier column present in the frame. */
  def relabelAll(df: DataFrame,
                 cols: Seq[String] = DEFAULT_COLUMNS): DataFrame =
    cols.filter(c => df.columns.exists(_.equalsIgnoreCase(c)))
      .foldLeft(df)(relabel)

  def relabel(df: DataFrame, colName: String): DataFrame = {
    val ranged = df.select(col(colName)).where(col(colName).isNotNull).distinct()
      .repartitionByRange(col(colName))
      .withColumn("_pid", spark_partition_id())
    val wIn = Window.partitionBy(col("_pid")).orderBy(col(colName))
    val withRn = ranged.withColumn("_rn", row_number().over(wIn).cast("long"))
    // per-partition counts → exclusive prefix sums; ≤ numPartitions rows,
    // so the single-partition window here is over a handful of counts
    val wOff = Window.orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withRn.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_offset", coalesce(sum(col("_cnt")).over(wOff), lit(0L)))
      .select(col("_pid"), col("_offset"))
    val mapping = withRn.join(broadcast(offsets), Seq("_pid"))
      .select(col(colName),
        concat(lit(colName + "_"), (col("_rn") - 1 + col("_offset")).cast("string"))
          .as("_anon"))
    df.join(mapping, Seq(colName), "left")
      .withColumn(colName, coalesce(col("_anon"), col(colName)))
      .drop("_anon")
  }
}

/** The reference CLIs' state-category selectors (--ended / --completed /
  * --cancelled / --failed, slurm2sql.py:1156-1160): two-letter sacct
  * state codes, matched against the full state names the `slurm` table
  * stores. `CANCELLED by <uid>` counts as CANCELLED (reference
  * test-data1 carries exactly that form). */
object SlurmStates {
  val CODE_TO_NAME: Map[String, String] = Map(
    "BF" -> "BOOT_FAIL", "CA" -> "CANCELLED", "CD" -> "COMPLETED",
    "DL" -> "DEADLINE", "F" -> "FAILED", "NF" -> "NODE_FAIL",
    "OOM" -> "OUT_OF_MEMORY", "PD" -> "PENDING", "PR" -> "PREEMPTED",
    "R" -> "RUNNING", "RQ" -> "REQUEUED", "RS" -> "RESIZING",
    "RV" -> "REVOKED", "S" -> "SUSPENDED", "TO" -> "TIMEOUT")

  /** ENDED_STATES (slurm2sql.py:1156) */
  val ENDED: Seq[String] = Seq("CA", "CD", "DL", "F", "NF", "OOM", "PR", "RV", "TO")
  /** COMPLETED_STATES (slurm2sql.py:1157) */
  val COMPLETED: Seq[String] = Seq("CD")
  /** CANCELLED_STATES (slurm2sql.py:1158) */
  val CANCELLED: Seq[String] = Seq("CA", "DL")
  /** FAILED_STATES (slurm2sql.py:1159) */
  val FAILED: Seq[String] = Seq("F", "NF", "OOM", "TO")

  /** State column falls in the category given by two-letter codes. */
  def inCategory(state: Column, codes: Seq[String]): Column =
    codes.map(CODE_TO_NAME).map(n => state === n || state.startsWith(n + " "))
      .reduce(_ || _)
}

/** The reporting CLIs (slurm2sql-sacct / slurm2sql-seff,
  * slurm2sql.py:1160-1371) as DataFrame transforms. Formatting (tabulate,
  * printf %) is presentation-layer and stays out; the numbers match. */
object Reports {

  /** --partition pattern → LIKE. The reference documents "a raw glob
    * match" (slurm2sql.py:1198) while its args_to_sql_where
    * (slurm2sql.py:1075) runs `LIKE '%'||p||'%'` — a substring test.
    * Honor both: a pattern carrying glob metacharacters translates to
    * an ANCHORED LIKE (`*`→`%`, `?`→`_` — so `gpu*` matches
    * `gpu_a100`, never `biggpu`); a plain pattern keeps the
    * reference's substring behavior. LIKE's own metacharacters in the
    * user's pattern are escaped (`\` is Spark's default LIKE escape),
    * so a literal `_` or `%` never silently wildcards. */
  private[graft] def globToLike(p: String): String = {
    val escaped = p.flatMap {
      case '\\' => "\\\\"
      case '%' => "\\%"
      case '_' => "\\_"
      case c => c.toString
    }
    val translated = escaped.map {
      case '*' => '%'
      case '?' => '_'
      case c => c
    }
    if (p.exists(c => c == '*' || c == '?')) translated else s"%$translated%"
  }

  /** sacct-style listing: field select + user/partition filters + order
    * (args_to_sql_where, slurm2sql.py:1071-1077), plus the state-category
    * selectors (--ended/--completed/--cancelled/--failed as two-letter
    * code sets) and --running-at-time (slurm2sql.py:1192-1203: expanded
    * to start=T end=T state=R — on the historical table that is
    * Start ≤ T < End, with a NULL End meaning still running). */
  def sacct(slurm: DataFrame, user: Option[String] = None,
            partition: Option[String] = None,
            states: Option[Seq[String]] = None,
            runningAtTime: Option[Long] = None): DataFrame = {
    val f1 = user.map(u => col("User") === u).getOrElse(lit(true))
    val f2 = partition.map(p => col("Partition").like(globToLike(p))).getOrElse(lit(true))
    val f3 = states.map(cs => SlurmStates.inCategory(col("State"), cs))
      .getOrElse(lit(true))
    val f4 = runningAtTime.map(t =>
      col("Start") <= t && (col("End").isNull || col("End") > t))
      .getOrElse(lit(true))
    slurm.filter(f1 && f2 && f3 && f4)
  }

  /** seff per-job report (slurm2sql.py:1332-1358), numeric columns.
    * Filter is `End IS NOT NULL` ONLY (slurm2sql.py:1335 — "this only
    * queries jobs with an End time"): a cancelled-never-started job has
    * End set but no Start and the reference still lists it. */
  def seffPerJob(eff: DataFrame): DataFrame =
    eff.filter(col("End").isNotNull)
      .select(
        col("JobID"), col("User"),
        rd(col("Elapsed") / 3600, 2).as("hours"),
        substring(col("State"), 1, 2).as("ST"),
        col("NCPUS"),
        col("CPUeff"),
        rd(col("AllocMem") / 1073741824L, 2).as("MemAllocGiB"),
        rd(col("TotalMem") / 1073741824L, 2).as("MemTotGiB"),
        col("MemEff"),
        col("NGpus"),
        col("GpuEff"),
        rd(SlurmViews.safeDiv(col("TotDiskRead"), col("Elapsed")) / 1048576L, 2).as("read_MiBps"),
        rd(SlurmViews.safeDiv(col("TotDiskWrite"), col("Elapsed")) / 1048576L, 2).as("write_MiBps"))

  /** seff --aggregate-user (slurm2sql.py:1300-1330): resource-days and
    * usage-weighted efficiencies per user. */
  def seffPerUser(eff: DataFrame): DataFrame =
    eff.filter(col("End").isNotNull)
      .groupBy(col("User"))
      .agg(
        rd(sum(col("Elapsed")) / 86400, 1).as("days"),
        rd(sum(col("Elapsed") * col("NCPUS")) / 86400, 1).as("cpu_day"),
        rd(SlurmViews.safeDiv(sum(col("Elapsed") * col("NCPUS") * col("CPUeff")),
          sum(col("Elapsed") * col("NCPUS"))) * 100, 4).as("cpueff_pct"),
        rd(sum(col("Elapsed") * col("AllocMem")) / 1073741824L / 86400, 1).as("mem_GiB_day"),
        rd(sum(col("Elapsed") * col("NGpus")) / 86400, 1).as("gpu_day"),
        rd(SlurmViews.safeDiv(sum(col("Elapsed") * col("NGpus") * col("GpuEff")),
          sum(col("Elapsed") * col("NGpus"))) * 100, 4).as("gpueff_pct"),
        rd(SlurmViews.safeDiv(sum(col("TotDiskRead") / 1048576L), sum(col("Elapsed"))), 2).as("read_MiBps"),
        rd(SlurmViews.safeDiv(sum(col("TotDiskWrite") / 1048576L), sum(col("Elapsed"))), 2).as("write_MiBps"))
}

/** The reference's `sacct_filter` passthrough (slurm2sql.py:738
  * `parse_known_args` + args_to_sacct_filter :1040-1048): any extra
  * `--key=value` argument rides through to sacct as a row selector,
  * and one bare positional that looks like a JobID becomes
  * `--jobs=ID`. graft cannot spawn sacct, so the same selectors are
  * applied as FILTERS on whatever rows the csv/sacct input carries —
  * strictly more capable than the reference (which cannot combine
  * them with --db), documented deviation.
  *
  * Supported keys (sacct's own selector spellings, comma lists where
  * sacct takes lists): jobs, user, account/accounts, partition,
  * state, name, starttime, endtime. Each token contributes one
  * predicate; tokens AND together. Unknown keys are an ERROR, never
  * silently ignored — a dropped filter would return unfiltered rows
  * as if they matched. */
object SacctFilter {

  val KEYS: Set[String] = Set("jobs", "user", "account", "accounts",
    "partition", "state", "name", "starttime", "endtime")

  /** `--key=value`, `--key value` handled by callers; this recognizes
    * a single token of the form `--key=value` or bare `key=value`.
    * Returns None when the token is not filter-shaped (callers fall
    * through to their own error path). */
  def parseToken(tok: String): Option[(String, String)] = {
    val t = if (tok.startsWith("--")) tok.drop(2) else tok
    t.split("=", 2) match {
      case Array(k, v) if KEYS.contains(k.toLowerCase) => Some((k.toLowerCase, v))
      case _ => None
    }
  }

  private def list(v: String): Seq[String] =
    v.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** Empty value lists must be an ERROR, not an empty reduce crash or
    * (worse) a silently-dropped filter: `--jobs=` / `--state=,` carry
    * no selectable value. */
  private def nonEmptyList(key: String, v: String): Either[String, Seq[String]] = {
    val l = list(v)
    if (l.isEmpty) Left(s"--$key: empty value") else Right(l)
  }

  /** One state value → full-name predicate: two-letter sacct codes via
    * [[SlurmStates.CODE_TO_NAME]], else the (upper-cased) full name;
    * `CANCELLED by <uid>` counts as CANCELLED. */
  private def stateMatch(v: String): Either[String, Column] = {
    val name = SlurmStates.CODE_TO_NAME.getOrElse(v.toUpperCase, v.toUpperCase)
    if (!SlurmStates.CODE_TO_NAME.valuesIterator.contains(name))
      Left(s"--state: unknown state '$v'")
    else Right(col("State") === name || col("State").startsWith(name + " "))
  }

  /** Translate parsed (key, value) tokens into one AND predicate.
    * starttime/endtime follow sacct's window semantics — keep jobs
    * whose [Start, End] interval overlaps the window (a NULL End means
    * still running; a NULL Start means not yet started and stays
    * in-window, sacct's eligible-time behavior). */
  def predicate(tokens: Seq[(String, String)]): Either[String, Column] = {
    val preds = tokens.map {
      case ("jobs", v) => nonEmptyList("jobs", v).flatMap { ids =>
        // validate the FULL id shape (sacct's `jobid[.step]` grammar,
        // the same regex the CLIs use for bare positionals) — a
        // first-char-only check let '1abc' through, which then
        // compared against NULL and silently matched nothing
        ids.find(id => !graft.tools.Cli.JOBID_RE.pattern.matcher(id).matches()) match {
          case Some(bad) => Left(s"--jobs: not a job id '$bad'")
          case None => Right(ids.map { id =>
            // a step-qualified id (456.batch / 456.0) selects that
            // STEP's rows, sacct's step-level selection — not the
            // whole job the step belongs to
            if (id.contains(".")) col("JobID") === id
            else col("JobIDonly") ===
              graft.functions.SlurmFunctions.jobIdOnly(lit(id))
          }.reduce(_ || _))
        }
      }
      case ("user", v) =>
        nonEmptyList("user", v).map(vs => col("User").isin(vs: _*))
      case ("account" | "accounts", v) =>
        nonEmptyList("account", v).map(vs => col("Account").isin(vs: _*))
      case ("partition", v) => nonEmptyList("partition", v).map(ps =>
        ps.map(p => col("Partition").like(Reports.globToLike(p))).reduce(_ || _))
      case ("name", v) =>
        nonEmptyList("name", v).map(vs => col("JobName").isin(vs: _*))
      case ("state", v) => nonEmptyList("state", v).flatMap { ss =>
        val ms = ss.map(stateMatch)
        ms.collectFirst { case Left(e) => Left(e) }
          .getOrElse(Right(ms.map(_.toOption.get).reduce(_ || _)))
      }
      case ("starttime", v) =>
        graft.tools.Cli.parseTime(v)
          .left.map(_ => s"starttime: cannot parse '$v'")
          .map(t => col("End").isNull || col("End") >= t)
      case ("endtime", v) =>
        graft.tools.Cli.parseTime(v)
          .left.map(_ => s"endtime: cannot parse '$v'")
          .map(t => col("Start").isNull || col("Start") <= t)
      case (k, _) => Left(s"unsupported sacct filter key '$k'")
    }
    preds.collectFirst { case Left(e) => Left(e) }
      .getOrElse(Right(preds.map(_.toOption.get)
        .foldLeft(lit(true))(_ && _)))
  }

  /** Apply the tokens to a slurm table (no-op on an empty list). */
  def apply(slurm: DataFrame, tokens: Seq[(String, String)]): Either[String, DataFrame] =
    if (tokens.isEmpty) Right(slurm)
    else predicate(tokens).map(slurm.filter)
}
