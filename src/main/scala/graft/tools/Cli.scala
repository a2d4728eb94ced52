package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.slurm.{HistoryCollector, Reports, SacctFilter, SacctSource, SlurmStates, SlurmTable, SlurmViews, SlurmWarehouse}

/** The reference's installed console scripts (`slurm2sql-sacct` /
  * `slurm2sql-seff`, slurm2sql.py:1160-1371 + the `__main__` dispatch
  * at :1373-1378) as Spark mains: `graft.tools.SacctCli` and
  * `graft.tools.SeffCli` (or `graft.tools.GraftCli sacct|seff ...`).
  *
  * Flag semantics follow the reference:
  *   --db PATH            read an existing graft warehouse (parquet),
  *                        don't import new data (slurm2sql.py:1172)
  *   --csv-input PATH     import this CSV instead of running sacct
  *   --sacct-input PATH   import a raw `sacct -P` dump (the sandbox
  *                        twin of spawning sacct — SURVEY §4 item 1)
  *   --output/-o LIST     comma field list, '*' for all, 'long' for
  *                        the longer default list (sacct CLI only)
  *   --format/-f FMT      simple | csv | tsv | json  (tabulate's
  *                        grid formats are presentation; these cover
  *                        the machine- and human-readable cases)
  *   --order EXPR         comma list of `col [desc]` — column names
  *                        only, NOT raw SQL: the reference passes the
  *                        string into SQL verbatim and documents the
  *                        injection; graft resolves names instead
  *   --user/-u U          filter (exact match, reference :1071-1077)
  *   --partition/-r P     filter (substring, or anchored glob when the
  *                        pattern carries * / ? — Reports.globToLike)
  *   --ended/-e --completed --cancelled --failed --running-at-time T
  *                        state-category selectors (mutually
  *                        exclusive, reference :1156-1159,1192-1203).
  *                        The reference can only apply them at sacct
  *                        fetch time (not with --db); graft applies
  *                        them as filters on any input — strictly more
  *                        capable, documented deviation.
  *   --aggregate-user     seff: per-user rollup (reference :1300)
  *   --long/-l            seff: add Start/End columns (:1288);
  *                        sacct: alias for --output long
  *   --write PATH         write the result as parquet instead of
  *                        printing — the 100 TB-safe path: rendering
  *                        collects to the driver and is meant for
  *                        human-sized reports; --write keeps the
  *                        output distributed end to end
  *   --limit N            cap printed rows (collect safety valve)
  *   --quiet/-q --verbose/-v  accepted for parity (logging is Spark's)
  *
  * A single positional argument that looks like a JobID selects that
  * job (args_to_sacct_filter, slurm2sql.py:1040-1048: `--jobs=ID`).
  */
object Cli {

  final case class Args(
      db: Option[String] = None,
      csvInput: Option[String] = None,
      sacctInput: Option[String] = None,
      output: Option[String] = None,
      format: String = "simple",
      order: Option[String] = None,
      user: Option[String] = None,
      partition: Option[String] = None,
      states: Option[Seq[String]] = None,
      runningAtTime: Option[Long] = None,
      aggregateUser: Boolean = false,
      long: Boolean = false,
      write: Option[String] = None,
      limit: Option[Int] = None,
      jobId: Option[String] = None,
      sacctFilter: Seq[(String, String)] = Nil)

  /** SACCT_DEFAULT_FIELDS (slurm2sql.py:1154) minus the '┃' spacer
    * pseudo-columns (pure presentation) — Start/End render as UTC
    * datetimes like the reference's `datetime(X,'unixepoch')`. */
  val SACCT_DEFAULT: Seq[String] = Seq(
    "JobID", "User", "State", "Start", "End", "Partition", "ExitCodeRaw",
    "NodeList", "NCPUS", "CPUTime", "CPUEff", "AllocMem", "TotalMem",
    "MemEff", "ReqGPUS", "GpuEff", "TotDiskRead", "TotDiskWrite",
    "ReqTRES", "AllocTRES", "TRESUsageInTot", "TRESUsageOutTot")

  /** SACCT_DEFAULT_FIELDS_LONG (:1155): adds Elapsed, ReqMem, MaxRSS,
    * GpuUtil at the reference's positions. */
  val SACCT_DEFAULT_LONG: Seq[String] = Seq(
    "JobID", "User", "State", "Start", "End", "Elapsed", "Partition",
    "ExitCodeRaw", "NodeList", "NCPUS", "CPUTime", "CPUEff", "AllocMem",
    "TotalMem", "MemEff", "ReqMem", "MaxRSS", "ReqGPUS", "GpuEff",
    "GpuUtil", "TotDiskRead", "TotDiskWrite", "ReqTRES", "AllocTRES",
    "TRESUsageInTot", "TRESUsageOutTot")

  private[graft] val JOBID_RE = "[0-9][0-9+_]*(\\.[0-9a-z]+)?".r

  /** argparse twin. Left = error/usage message (caller prints + exits
    * 2, the argparse failure code). Accepts `--flag value` and
    * `--flag=value`; short flags; one optional positional JobID. */
  def parse(argv: Seq[String]): Either[String, Args] = {
    var a = Args()
    var stateFlag: Option[String] = None
    def setStates(flag: String, codes: Seq[String]): Either[String, Unit] =
      stateFlag match {
        case Some(prev) => Left(s"$flag: not allowed with $prev " +
          "(state selectors are mutually exclusive)")
        case None => stateFlag = Some(flag); a = a.copy(states = Some(codes)); Right(())
      }
    val it = argv.iterator.buffered
    def value(flag: String, inline: Option[String]): Either[String, String] =
      inline match {
        case Some(v) => Right(v)
        // a following flag is NOT this flag's value (argparse errors
        // on `--user --format csv` instead of binding user="--format")
        case None if it.hasNext && !it.head.startsWith("--") => Right(it.next())
        case None => Left(s"$flag: expected a value")
      }
    while (it.hasNext) {
      val tok = it.next()
      val (flag, inline) = tok.split("=", 2) match {
        case Array(f, v) if f.startsWith("--") => (f, Some(v))
        case _ => (tok, None)
      }
      val res: Either[String, Unit] = flag match {
        case "--db" => value(flag, inline).map(v => a = a.copy(db = Some(v)))
        case "--csv-input" => value(flag, inline).map(v => a = a.copy(csvInput = Some(v)))
        case "--sacct-input" => value(flag, inline).map(v => a = a.copy(sacctInput = Some(v)))
        case "--output" | "-o" => value(flag, inline).map(v => a = a.copy(output = Some(v)))
        case "--format" | "-f" => value(flag, inline).flatMap {
          case v @ ("simple" | "csv" | "tsv" | "json") => Right { a = a.copy(format = v) }
          case v => Left(s"--format: unknown format '$v' (simple|csv|tsv|json)")
        }
        case "--order" => value(flag, inline).map(v => a = a.copy(order = Some(v)))
        case "--user" | "-u" => value(flag, inline).map(v => a = a.copy(user = Some(v)))
        case "--partition" | "-r" => value(flag, inline).map(v => a = a.copy(partition = Some(v)))
        case "--ended" | "-e" => setStates(flag, SlurmStates.ENDED)
        case "--completed" => setStates(flag, SlurmStates.COMPLETED)
        case "--cancelled" => setStates(flag, SlurmStates.CANCELLED)
        case "--failed" => setStates(flag, SlurmStates.FAILED)
        case "--running-at-time" => value(flag, inline).flatMap { v =>
          stateFlag match {
            case Some(prev) => Left(s"--running-at-time: not allowed with $prev")
            case None =>
              stateFlag = Some(flag)
              parseTime(v).map(t => a = a.copy(runningAtTime = Some(t)))
          }
        }
        case "--aggregate-user" => Right { a = a.copy(aggregateUser = true) }
        case "--long" | "-l" => Right { a = a.copy(long = true) }
        case "--write" => value(flag, inline).map(v => a = a.copy(write = Some(v)))
        case "--limit" => value(flag, inline).flatMap(v =>
          v.toIntOption.toRight(s"--limit: not a number: '$v'")
            .map(n => a = a.copy(limit = Some(n))))
        case "--quiet" | "-q" | "--verbose" | "-v" => Right(())
        // sacct_filter passthrough (slurm2sql.py:738 parse_known_args +
        // args_to_sacct_filter :1040-1048): extra sacct selectors are
        // applied as row filters — `--jobs=ID`, `--state=CD`,
        // `--account=x`, bare `key=value`, `-j/-S/-E` shorts
        case "--jobs" | "-j" => value(flag, inline).map(v =>
          a = a.copy(sacctFilter = a.sacctFilter :+ ("jobs", v)))
        case "--starttime" | "-S" => value(flag, inline).map(v =>
          a = a.copy(sacctFilter = a.sacctFilter :+ ("starttime", v)))
        case "--endtime" | "-E" => value(flag, inline).map(v =>
          a = a.copy(sacctFilter = a.sacctFilter :+ ("endtime", v)))
        case f if f.startsWith("--") &&
            SacctFilter.KEYS.contains(f.drop(2).toLowerCase) =>
          value(flag, inline).map(v => a = a.copy(sacctFilter =
            a.sacctFilter :+ (f.drop(2).toLowerCase, v)))
        case p if !p.startsWith("-") && JOBID_RE.pattern.matcher(p).matches() &&
            a.jobId.isEmpty =>
          Right { a = a.copy(jobId = Some(p)) }
        case p if !p.startsWith("-") && SacctFilter.parseToken(p).isDefined =>
          Right { a = a.copy(sacctFilter = a.sacctFilter :+
            SacctFilter.parseToken(p).get) }
        case other => Left(s"unknown argument '$other' (graft reads stored " +
          "data — supported sacct passthrough selectors: " +
          SacctFilter.KEYS.toSeq.sorted.map(k => s"--$k=").mkString(", ") +
          "; use --db/--csv-input/--sacct-input plus the documented selectors)")
      }
      res match { case Left(e) => return Left(e); case Right(_) => () }
    }
    if (a.db.isEmpty && a.csvInput.isEmpty && a.sacctInput.isEmpty)
      Left("one of --db, --csv-input, --sacct-input is required " +
        "(graft cannot spawn sacct in this environment)")
    else Right(a)
  }

  /** `--running-at-time` accepts epoch seconds or an ISO local
    * datetime (interpreted UTC, the unixTime/s05 convention). */
  def parseTime(v: String): Either[String, Long] =
    if (v.nonEmpty && v.forall(_.isDigit)) Right(v.toLong)
    else try {
      val base = if (v.length == 10) v + "T00:00:00"
                 else v.replace(' ', 'T') + (if (v.count(_ == ':') == 1) ":00" else "")
      Right(java.time.LocalDateTime.parse(base)
        .toEpochSecond(java.time.ZoneOffset.UTC))
    } catch { case _: Exception =>
      Left(s"--running-at-time: cannot parse '$v' (epoch or YYYY-MM-DD[ HH:MM[:SS]])")
    }

  /** Load the slurm table from whichever input the args name. The
    * warehouse path is a partitioned-parquet scan (day-pruned,
    * cluster-ready); csv/sacct paths ingest + derive on the fly. */
  def loadSlurm(spark: SparkSession, a: Args): DataFrame =
    a.db.map(SlurmWarehouse.read(spark, _))
      .orElse(a.csvInput.map(SacctSource.loadSlurmTable(spark, _)))
      .orElse(a.sacctInput.map(p =>
        SlurmTable.build(SacctSource.readSacct(spark, p))))
      .getOrElse(sys.error("no input (parse() guarantees one)"))

  private def resolve(df: DataFrame, name: String): Either[String, String] =
    df.columns.find(_.equalsIgnoreCase(name.trim))
      .toRight(s"unknown column '${name.trim}' (have: ${df.columns.mkString(", ")})")

  /** `--order` = comma list of `col [desc]`, names resolved
    * case-insensitively (SQLite is case-insensitive; raw SQL is not
    * honored — see the scaladoc). */
  def orderCols(df: DataFrame, order: String): Either[String, Seq[Column]] = {
    val parts = order.split(",").map(_.trim).filter(_.nonEmpty)
    val res = parts.map { p =>
      val (name, desc) = p.split("\\s+") match {
        case Array(n) => (n, false)
        case Array(n, d) if d.equalsIgnoreCase("desc") => (n, true)
        case Array(n, d) if d.equalsIgnoreCase("asc") => (n, false)
        case _ => return Left(s"--order: cannot parse '$p'")
      }
      resolve(df, name).map(c => if (desc) col(c).desc else col(c).asc)
    }
    res.collectFirst { case Left(e) => Left(e) }
      .getOrElse(Right(res.map(_.toOption.get).toSeq))
  }

  /** The sacct report frame (sacct_cli, slurm2sql.py:1160-1226):
    * filters via [[Reports.sacct]], then the field projection. */
  def sacctFrame(spark: SparkSession, a: Args): Either[String, DataFrame] = {
    val slurm0 = loadSlurm(spark, a)
    val slurm1 = a.jobId match {
      case Some(id) => slurm0.filter(col("JobIDonly") ===
        graft.functions.SlurmFunctions.jobIdOnly(lit(id)))
      case None => slurm0
    }
    val slurm = SacctFilter(slurm1, a.sacctFilter) match {
      case Left(e) => return Left(e)
      case Right(df) => df
    }
    val filtered = Reports.sacct(slurm, a.user, a.partition, a.states,
      a.runningAtTime)
    val fieldSpec = a.output.getOrElse(if (a.long) "long" else "default")
    val fields: Either[String, Seq[Column]] = fieldSpec match {
      case "*" => Right(filtered.columns.toSeq.map(col))
      case "long" | "default" =>
        val names = if (fieldSpec == "long") SACCT_DEFAULT_LONG else SACCT_DEFAULT
        Right(names.map {
          // datetime(X,'unixepoch') rendering (slurm2sql.py:1154): UTC
          // Tables.session pins the session timeZone to UTC, so
          // date_format over timestamp_seconds IS the unixepoch form
          case n @ ("Start" | "End") =>
            date_format(timestamp_seconds(col(n)), "yyyy-MM-dd HH:mm:ss").as(n)
          case n => col(n)
        })
      case list =>
        val res = list.split(",").map(n => resolve(filtered, n))
        res.collectFirst { case Left(e) => Left(e) }
          .getOrElse(Right(res.map(r => col(r.toOption.get)).toSeq))
    }
    for {
      fs <- fields
      ord <- a.order.map(orderCols(filtered, _)).getOrElse(Right(Seq.empty))
    } yield {
      val proj = filtered.select(fs: _*)
      if (ord.nonEmpty) proj.orderBy(ord: _*) else proj
    }
  }

  /** The seff report frame (seff_cli, slurm2sql.py:1228-1371): the eff
    * view, End-IS-NOT-NULL rule inside Reports.seff*, user/partition
    * applied on eff (the reference's WHERE rides the eff select). */
  def seffFrame(spark: SparkSession, a: Args): Either[String, DataFrame] = {
    val slurm0 = loadSlurm(spark, a)
    val slurm1 = a.jobId match {
      case Some(id) => slurm0.filter(col("JobIDonly") ===
        graft.functions.SlurmFunctions.jobIdOnly(lit(id)))
      case None => slurm0
    }
    val slurm = SacctFilter(slurm1, a.sacctFilter) match {
      case Left(e) => return Left(e)
      case Right(df) => df
    }
    // state/running-at selectors act on allocation rows pre-rollup
    // (the reference applies them at sacct fetch = raw rows)
    val selected = Reports.sacct(slurm, None, None, a.states, a.runningAtTime)
    val eff = SlurmViews.eff(selected)
    val f1 = a.user.map(u => col("User") === u).getOrElse(lit(true))
    val f2 = a.partition.map(p =>
      col("Partition").like(Reports.globToLike(p))).getOrElse(lit(true))
    val effF = eff.filter(f1 && f2)
    val base =
      if (a.aggregateUser) Reports.seffPerUser(effF)
      else {
        val perJob = Reports.seffPerJob(effF)
        if (a.long) {
          // --long: start/end columns, strftime('%m-%d_%H:%M') (:1288)
          val startEnd = effF.select(col("JobID"),
            date_format(timestamp_seconds(col("Start")), "MM-dd_HH:mm").as("StartT"),
            date_format(timestamp_seconds(col("End")), "MM-dd_HH:mm").as("EndT"))
          perJob.join(startEnd, Seq("JobID"), "left")
        } else perJob
      }
    a.order.map(orderCols(base, _)).getOrElse(Right(Seq.empty))
      .map(ord => if (ord.nonEmpty) base.orderBy(ord: _*) else base)
  }

  /** Collect + format. Reports are human-sized (bounded by jobs/users
    * on screen); `--limit` guards, `--write` bypasses entirely. */
  def render(df: DataFrame, format: String, limit: Option[Int]): String = {
    val capped = limit.map(df.limit).getOrElse(df)
    val names = capped.columns
    val rows = capped.collect().map(_.toSeq.map {
      case null => ""
      case d: Double => if (d == d.floor && math.abs(d) < 1e15) f"$d%.1f" else d.toString
      case x => x.toString
    })
    format match {
      case "csv" => (names.mkString(",") +: rows.map(_.map(csvQuote).mkString(","))).mkString("\n")
      case "tsv" => (names.mkString("\t") +: rows.map(_.mkString("\t"))).mkString("\n")
      case "json" => rows.map(r => names.zip(r)
        .map { case (k, v) => "\"" + k + "\":" + "\"" + jsonEscape(v) + "\"" }
        .mkString("{", ",", "}")).mkString("\n")
      case _ => // simple: tabulate-style aligned columns
        val widths = names.indices.map(i =>
          (names(i).length +: rows.map(_(i).length)).max)
        val header = names.zipWithIndex.map { case (n, i) => n.padTo(widths(i), ' ') }.mkString("  ")
        val sep = widths.map("-" * _).mkString("  ")
        val body = rows.map(r => r.zipWithIndex.map { case (v, i) => v.padTo(widths(i), ' ') }.mkString("  "))
        (header +: sep +: body).mkString("\n")
    }
  }

  // minimal RFC 8259 string escaping: backslash and quote, then the
  // control range (a raw TRES/NodeList backslash must not produce an
  // unparseable --format json line)
  private def jsonEscape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def csvQuote(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\"" else s

  def session(): SparkSession = graft.Tables.session("graft-cli",
    sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(8, Runtime.getRuntime.availableProcessors()).toString))

  /** Shared main body; `frame` picks the report. Exit codes mirror the
    * reference: 2 on bad args or an empty seff result (:1327,1362). */
  def run(argv: Array[String],
          frame: (SparkSession, Args) => Either[String, DataFrame],
          emptyExits: Boolean): Unit =
    parse(argv.toSeq) match {
      case Left(err) =>
        System.err.println(s"error: $err")
        sys.exit(2)
      case Right(a) =>
        val spark = session()
        val out = frame(spark, a) match {
          case Left(err) =>
            System.err.println(s"error: $err"); spark.stop(); sys.exit(2)
          case Right(df) => df
        }
        a.write match {
          case Some(path) =>
            out.write.mode("overwrite").parquet(path)
            System.err.println(s"[cli] wrote ${path}")
          case None =>
            val rendered = render(out, a.format, a.limit)
            // zero DATA rows (reference :1327) — count per format:
            // 'simple' always carries header + separator lines, so a
            // newline test can never fire for the default format
            val bodyRows = a.format match {
              case "simple" => rendered.linesIterator.size - 2
              case "csv" | "tsv" => rendered.linesIterator.size - 1
              case _ => rendered.linesIterator.count(_.nonEmpty)
            }
            if (emptyExits && bodyRows <= 0) {
              println("No data fetched with these sacct options.")
              spark.stop(); sys.exit(2)
            }
            println(rendered)
        }
        spark.stop()
    }
}

/** `graft-sacct` — the slurm2sql-sacct twin. */
object SacctCli {
  def main(args: Array[String]): Unit = Cli.run(args, Cli.sacctFrame, emptyExits = false)
}

/** `graft-seff` — the slurm2sql-seff twin. */
object SeffCli {
  def main(args: Array[String]): Unit = Cli.run(args, Cli.seffFrame, emptyExits = true)
}

/** `graft-ingest` — the reference's PRIMARY command (`slurm2sql
  * [options] db`, slurm2sql.py:694-788): build or update the
  * warehouse from an sacct/CSV dump, with the day-batched history
  * collection and resume bookkeeping of get_history (:792-860).
  *
  *   positional WAREHOUSE   parquet warehouse dir (the `db` argument)
  *   --sacct-input F        raw `sacct -P` dump / --csv-input F;
  *                          with NEITHER flag, graft spawns `sacct`
  *                          itself — the reference's primary mode
  *                          (slurm2sql.py:854-866): one subprocess
  *                          per ingest, or one per day batch under a
  *                          history flag, each fed through the same
  *                          reassembled-parse path a dump takes
  *   --sacct-bin B          executable for live mode (default
  *                          `sacct`; the test seam — the reference's
  *                          tests stub the subprocess the same way)
  *   --update/-u            merge into an existing warehouse instead
  *                          of recreating it (:750-752: without
  *                          --update or a resume flag, an existing db
  *                          is deleted first)
  *   --history SPEC         ingest [now - slurmtime(SPEC), now) in
  *                          day batches (:822)
  *   --history-days N       from UTC midnight N days back (:825)
  *   --history-start D      from YYYY-MM-DD; --history-end D caps the
  *                          range (default now + 6 h) (:827-832)
  *   --history-resume       resume from the stored bookmark - 5 s
  *                          (:805-821); --history-resume-or-start SPEC
  *                          falls back to now - slurmtime(SPEC) when
  *                          no bookmark exists
  *   --jobs-only            allocations only, no steps (`sacct -X`)
  *   --now TS               pin "now" (epoch/ISO) for deterministic
  *                          tests; defaults to wall clock
  *   --ended/-e --completed --cancelled --failed --running-at-time T
  *                          ingest-time state-category selectors
  *                          (slurm2sql.py:726-732; mutually
  *                          exclusive): the reference expands them
  *                          into sacct fetch args, graft filters the
  *                          csv/sacct input rows — a completed-only
  *                          warehouse at collection time
  *   SACCT_FILTER           extra selectors ride through as row
  *                          filters (parse_known_args,
  *                          slurm2sql.py:738 + args_to_sacct_filter
  *                          :1040-1048): `--jobs=ID`, `--user=U`,
  *                          `--account=A`, `--state=CD`, bare
  *                          `key=value` positionals, and one bare
  *                          JobID positional (the `--jobs=ID`
  *                          shorthand)
  *
  * Each day batch REPLACE-merges and advances the bookmark before the
  * next starts, so a crash resumes from the last committed day. Exit
  * 1 when batches failed (reference :786), 2 on bad args. */
object IngestCli {
  final case class IngestArgs(
      warehouse: String = "",
      csvInput: Option[String] = None,
      sacctInput: Option[String] = None,
      update: Boolean = false,
      history: Option[String] = None,
      historyResume: Boolean = false,
      historyResumeOrStart: Option[String] = None,
      historyDays: Option[Int] = None,
      historyStart: Option[String] = None,
      historyEnd: Option[String] = None,
      jobsOnly: Boolean = false,
      now: Option[Long] = None,
      states: Option[Seq[String]] = None,
      runningAtTime: Option[Long] = None,
      sacctFilter: Seq[(String, String)] = Nil,
      sacctBin: String = "sacct",
      spillDir: Option[String] = None)

  private def slurmtime(flag: String, v: String): Either[String, Long] = {
    val s = graft.functions.SlurmTimeUtil.parseOrNaN(
      org.apache.spark.unsafe.types.UTF8String.fromString(v))
    if (s.isNaN) Left(s"$flag: cannot parse slurm time '$v'")
    else Right(s.toLong)
  }

  private def midnight(epoch: Long): Long = (epoch / 86400L) * 86400L

  def parse(args: Seq[String]): Either[String, IngestArgs] = {
    var a = IngestArgs()
    var rest = args.toList
    var stateFlag: Option[String] = None
    def setStates(flag: String, codes: Seq[String]): Either[String, Unit] =
      stateFlag match {
        case Some(prev) => Left(s"$flag: not allowed with $prev " +
          "(state selectors are mutually exclusive)")
        case None => stateFlag = Some(flag)
          a = a.copy(states = Some(codes)); Right(())
      }
    def value(flag: String, inline: Option[String]): Either[String, String] =
      inline.orElse {
        rest match { case v :: t if !v.startsWith("--") => rest = t; Some(v)
                     case _ => None }
      }.toRight(s"$flag: expected a value")
    while (rest.nonEmpty) {
      val tok = rest.head; rest = rest.tail
      // only --flag=value splits; a positional path may contain '='
      val (flag, inline) = tok.split("=", 2) match {
        case Array(f, v) if f.startsWith("--") => (f, Some(v))
        case _ => (tok, None)
      }
      val res: Either[String, Unit] = flag match {
        case "--csv-input" => value(flag, inline).map(v => a = a.copy(csvInput = Some(v)))
        case "--sacct-input" => value(flag, inline).map(v => a = a.copy(sacctInput = Some(v)))
        case "--sacct-bin" => value(flag, inline).map(v => a = a.copy(sacctBin = v))
        case "--spill-dir" => value(flag, inline).map(v => a = a.copy(spillDir = Some(v)))
        case "--update" | "-u" => Right { a = a.copy(update = true) }
        case "--history" => value(flag, inline).map(v => a = a.copy(history = Some(v)))
        case "--history-resume" => Right { a = a.copy(historyResume = true) }
        case "--history-resume-or-start" =>
          value(flag, inline).map(v => a = a.copy(historyResumeOrStart = Some(v)))
        case "--history-days" => value(flag, inline).flatMap(v =>
          v.toIntOption.toRight(s"--history-days: not an int '$v'")
            .map(n => a = a.copy(historyDays = Some(n))))
        case "--history-start" => value(flag, inline).map(v => a = a.copy(historyStart = Some(v)))
        case "--history-end" => value(flag, inline).map(v => a = a.copy(historyEnd = Some(v)))
        case "--jobs-only" => Right { a = a.copy(jobsOnly = true) }
        case "--now" => value(flag, inline).flatMap(v =>
          Cli.parseTime(v).left.map(_ => s"--now: cannot parse '$v'")
            .map(t => a = a.copy(now = Some(t))))
        case "--quiet" | "-q" | "--verbose" | "-v" => Right(())
        // ingest-time state selectors (slurm2sql.py:726-732)
        case "--ended" | "-e" => setStates(flag, SlurmStates.ENDED)
        case "--completed" => setStates(flag, SlurmStates.COMPLETED)
        case "--cancelled" => setStates(flag, SlurmStates.CANCELLED)
        case "--failed" => setStates(flag, SlurmStates.FAILED)
        case "--running-at-time" => value(flag, inline).flatMap { v =>
          stateFlag match {
            case Some(prev) => Left(s"--running-at-time: not allowed with $prev")
            case None =>
              stateFlag = Some(flag)
              Cli.parseTime(v).map(t => a = a.copy(runningAtTime = Some(t)))
          }
        }
        // sacct_filter passthrough (parse_known_args, slurm2sql.py:738)
        case "--jobs" | "-j" => value(flag, inline).map(v =>
          a = a.copy(sacctFilter = a.sacctFilter :+ ("jobs", v)))
        case "-S" => value(flag, inline).map(v =>
          a = a.copy(sacctFilter = a.sacctFilter :+ ("starttime", v)))
        case "-E" => value(flag, inline).map(v =>
          a = a.copy(sacctFilter = a.sacctFilter :+ ("endtime", v)))
        case f if f.startsWith("--") &&
            SacctFilter.KEYS.contains(f.drop(2).toLowerCase) =>
          value(flag, inline).map(v => a = a.copy(sacctFilter =
            a.sacctFilter :+ (f.drop(2).toLowerCase, v)))
        case f if !f.startsWith("-") && a.warehouse.isEmpty =>
          Right { a = a.copy(warehouse = f) }
        // post-warehouse positionals: a bare JobID is the `--jobs=ID`
        // shorthand (args_to_sacct_filter :1046); `key=value` is a
        // filter token
        case p if !p.startsWith("-") &&
            Cli.JOBID_RE.pattern.matcher(p).matches() =>
          Right { a = a.copy(sacctFilter = a.sacctFilter :+ ("jobs", p)) }
        case p if !p.startsWith("-") && SacctFilter.parseToken(p).isDefined =>
          Right { a = a.copy(sacctFilter = a.sacctFilter :+
            SacctFilter.parseToken(p).get) }
        case f => Left(s"unrecognized flag $f (supported sacct " +
          "passthrough selectors: " +
          SacctFilter.KEYS.toSeq.sorted.map(k => s"--$k=").mkString(", ") + ")")
      }
      res match { case Left(e) => return Left(e); case _ => }
    }
    if (a.warehouse.isEmpty) Left("warehouse directory argument is required")
    else if (a.historyEnd.isDefined && a.history.isEmpty && !a.historyResume &&
      a.historyResumeOrStart.isEmpty && a.historyDays.isEmpty &&
      a.historyStart.isEmpty)
      Left("--history-end requires a start selector " +
        "(--history/--history-days/--history-start/--history-resume)")
    else Right(a)
  }

  /** Slurm's timestamp format for -S/-E (slurm2sql.py:110-115),
    * rendered in UTC: the reference formats in the login node's local
    * zone; graft pins UTC so a distributed ingest is deterministic
    * regardless of driver locale. The INTERPRETATION side is pinned
    * too — SacctSource.spawnSacct sets TZ=UTC on the subprocess, so
    * sacct parses these bare timestamps in the same zone they were
    * rendered in (rendering-only pinning would shift every live
    * window by the driver's UTC offset). */
  private def slurmTs(epoch: Long): String =
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochSecond(epoch))

  /** Runs the ingest; returns the error-batch count (0 = clean). */
  def ingest(spark: SparkSession, a: IngestArgs): Either[String, Int] = {
    val live0 = a.csvInput.isEmpty && a.sacctInput.isEmpty
    // live stdout spills land on a SHARED filesystem under the
    // warehouse (executors on a real cluster cannot read the driver's
    // /tmp); --spill-dir points them elsewhere (e.g. a scratch FS).
    // The post-ingest cleanup deletes the spill path RECURSIVELY, so
    // what gets deleted must be graft-owned: the default base
    // (<warehouse>/_sacct_spill) is ours and is removed whole, but a
    // user-supplied --spill-dir may be an existing shared scratch
    // location — spills land in a per-run subdirectory beneath it and
    // only that subdirectory is deleted; pre-existing contents
    // survive the ingest.
    val spill = if (live0) Some(a.spillDir match {
      case None => a.warehouse.stripSuffix("/") + "/_sacct_spill"
      case Some(base) => base.stripSuffix("/") + "/graft_run_" +
        java.util.UUID.randomUUID().toString.take(12)
    }) else None
    try ingestBody(spark, a, spill)
    finally spill.foreach(SacctSource.deleteSpillDir(spark, _))
  }

  private def ingestBody(spark: SparkSession, a: IngestArgs,
                         spill: Option[String]): Either[String, Int] = {
    val now = a.now.getOrElse(System.currentTimeMillis() / 1000L)
    val live = a.csvInput.isEmpty && a.sacctInput.isEmpty
    // in-plan selection shared by every input mode (the reference can
    // only select at sacct fetch time; graft ALSO filters in-plan so
    // the result is exact even against a slurm version — or a test
    // stub — that ignores a selector): jobs-only, state category /
    // --running-at-time, then the sacct_filter tokens
    def postFilter(raw0: DataFrame): Either[String, DataFrame] = {
      val raw1 = if (a.jobsOnly) raw0.filter(col("JobStep").isNull) else raw0
      val raw2 = Reports.sacct(raw1, None, None, a.states, a.runningAtTime)
      SacctFilter(raw2, a.sacctFilter)
    }
    // the sacct-argument form of the same selections
    // (args_to_sacct_filter, slurm2sql.py:1039-1069) — passed to the
    // spawned sacct so a real slurmdbd prunes server-side
    def liveFilterArgs: Seq[String] = {
      val states = a.states.toSeq.flatMap(ss =>
        Seq("--endtime=now", s"--state=${ss.mkString(",")}"))
      val rat = a.runningAtTime.toSeq.flatMap(t =>
        Seq(s"--start=${slurmTs(t)}", s"--end=${slurmTs(t)}",
          "--state=RUNNING"))
      val toks = a.sacctFilter.map { case (k, v) => s"--$k=$v" }
      states ++ rat ++ toks
    }
    def fetchLive(extra: Seq[String]): Either[String, DataFrame] =
      SacctSource.liveSlurmTable(spark, liveFilterArgs ++ extra, a.sacctBin,
        spill).flatMap(postFilter)
    // dump mode reads the input ONCE; live mode fetches at use —
    // once for a plain ingest, once per day batch in the history loop
    // (the reference's whole reason for day batching is "avoid
    // overloading sacct", slurm2sql.py:795-798, which only means
    // anything if each batch is its own sacct call)
    def rawOnce: Either[String, DataFrame] =
      if (live) fetchLive(Nil)
      else postFilter(
        a.csvInput.map(SacctSource.loadSlurmTable(spark, _))
          .orElse(a.sacctInput.map(p =>
            SlurmTable.build(SacctSource.readSacct(spark, p))))
          .get)
    val historyMode = a.history.isDefined || a.historyResume ||
      a.historyResumeOrStart.isDefined || a.historyDays.isDefined ||
      a.historyStart.isDefined
    // without --update or a resume flag an existing warehouse is
    // recreated, never silently merged (slurm2sql.py:750-752).
    // Hadoop-FS per-path resolution: java.io.File never "exists" for
    // an hdfs:// or s3a:// warehouse, which would silently turn the
    // recreate into a merge against stale data
    if (!a.update && !a.historyResume && a.historyResumeOrStart.isEmpty) {
      val path = new org.apache.hadoop.fs.Path(a.warehouse)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path) && !fs.delete(path, true))
        return Left(s"cannot delete existing warehouse ${a.warehouse} " +
          "(use --update to merge instead)")
    }
    if (!historyMode) {
      rawOnce.map { raw =>
        val maxT = SlurmWarehouse.mergeInto(spark, raw, a.warehouse)
        maxT.foreach(t => SlurmWarehouse.updateLastTimestamp(
          spark, a.warehouse, math.min(t, now)))
        0
      }
    } else {
      val startE: Either[String, Long] =
        if (a.historyResumeOrStart.isDefined)
          slurmtime("--history-resume-or-start", a.historyResumeOrStart.get)
            .map(s => HistoryCollector.resumeStart(spark, a.warehouse, now - s))
        else if (a.historyResume)
          Right(HistoryCollector.resumeStart(spark, a.warehouse, now))
        else if (a.history.isDefined)
          slurmtime("--history", a.history.get).map(now - _)
        else if (a.historyDays.isDefined)
          Right(midnight(now) - a.historyDays.get * 86400L)
        else Cli.parseTime(a.historyStart.get)
          .left.map(_ => s"--history-start: cannot parse '${a.historyStart.get}'")
      val stopE: Either[String, Long] = a.historyEnd match {
        case Some(v) => Cli.parseTime(v)
          .left.map(_ => s"--history-end: cannot parse '$v'")
        // reference default is now + 6h, NOT now (slurm2sql.py:831
        // `stop = now + datetime.timedelta(seconds=6*3600)`), so the
        // final partial-day batch window includes jobs reported
        // slightly ahead of the collection clock
        case None => Right(now + 6L * 3600L)
      }
      for {
        start <- startE
        stop <- stopE
        // each day is one sacct batch: a mis-typed spec that expands
        // to centuries would grind through thousands of no-op batches
        // before anyone notices — fail fast instead
        _ <- if (stop - start > 36600L * 86400L)
          Left(s"history range [$start, $stop) exceeds 100 years — " +
            "check --history/--history-days/--history-start/--now")
        else Right(())
        fetch <- if (live)
          // per-batch sacct spawn with -S/-E, the reference's loop
          // body (slurm2sql.py:838-845); a failed spawn throws inside
          // the batch and HistoryCollector counts it as a batch error
          Right((s: Long, e: Long) => fetchLive(Seq(
            "-S", slurmTs(s), "-E", slurmTs(e))) match {
            case Left(err) => throw new RuntimeException(err)
            case Right(df) => df
          })
        else rawOnce.map { raw =>
          val ts = coalesce(col("Time"), col("Submit"))
          (s: Long, e: Long) => raw.filter(ts >= s && ts < e)
        }
      } yield HistoryCollector.collect(spark, a.warehouse, fetch,
        start, stop, now)
    }
  }

  def main(args: Array[String]): Unit = parse(args.toSeq) match {
    case Left(err) =>
      System.err.println(s"error: $err"); sys.exit(2)
    case Right(a) =>
      val spark = Cli.session()
      ingest(spark, a) match {
        case Left(err) =>
          System.err.println(s"error: $err"); spark.stop(); sys.exit(2)
        case Right(errors) =>
          spark.stop()
          if (errors > 0) {
            System.err.println(s"[ingest] completed with $errors errors")
            sys.exit(1)
          }
      }
  }
}

/** `graft-deidentify` — the deidentify.py surface (script-shaped in
  * the reference, not a console script; its semantics are the s21
  * gate): rewrite identifier columns of an existing warehouse IN
  * PLACE, each distinct value → `<col>_<i>` (deidentify.py:7
  * column list, :27-46 relabel loop — graft's index is the value's
  * global sort rank, the documented deterministic-under-parallelism
  * deviation).
  *
  *   positional WAREHOUSE   parquet warehouse dir (the `db` argument)
  *   --columns C1,C2        override the reference column list; an
  *                          explicitly named column missing from the
  *                          warehouse schema is an ERROR (the
  *                          reference's UPDATE would fail too); with
  *                          the default list, absent columns are
  *                          skipped
  *
  * The rewrite stages into `<warehouse>_deidentifying` and swaps by
  * rename-aside (live → `slurm_predeid`, staged → live, delete) so
  * every crash point leaves a recoverable directory — the
  * compactBucketed ordering lesson applied to bare dirs. Prints the
  * reference's per-column `colname=X, mapped N distinct values`
  * summary. Exit 2 on bad args or a missing warehouse. */
object DeidentifyCli {
  final case class DeidArgs(warehouse: String = "",
                            columns: Seq[String] = Nil,
                            explicit: Boolean = false)

  def parse(args: Seq[String]): Either[String, DeidArgs] = {
    def loop(rest: Seq[String], a: DeidArgs): Either[String, DeidArgs] = rest match {
      case Seq() =>
        if (a.warehouse.isEmpty) Left("missing warehouse argument")
        else Right(if (a.explicit) a
          else a.copy(columns = graft.slurm.Deidentify.DEFAULT_COLUMNS))
      case s if s.head == "--columns" && s.tail.nonEmpty =>
        loop(s.tail.tail, a.copy(
          columns = s.tail.head.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          explicit = true))
      case s if s.head.startsWith("--columns=") =>
        loop(s.tail, a.copy(
          columns = s.head.drop(10).split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          explicit = true))
      case s if s.head.startsWith("-") => Left(s"unknown flag ${s.head}")
      case s if a.warehouse.isEmpty => loop(s.tail, a.copy(warehouse = s.head))
      case s => Left(s"unexpected argument ${s.head}")
    }
    loop(args, DeidArgs()).flatMap(a =>
      if (a.explicit && a.columns.isEmpty) Left("--columns: empty list") else Right(a))
  }

  /** Relabel + in-place swap; returns (column, mapped distinct count)
    * per relabelled column. */
  def run(spark: SparkSession, a: DeidArgs): Either[String, Seq[(String, Long)]] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val whPath = new org.apache.hadoop.fs.Path(a.warehouse)
    val fs = whPath.getFileSystem(hconf)
    if (!fs.exists(new org.apache.hadoop.fs.Path(a.warehouse + "/slurm")))
      return Left(s"no warehouse at ${a.warehouse}")
    val df = SlurmWarehouse.read(spark, a.warehouse)
    val present = a.columns.filter(c => df.columns.exists(_.equalsIgnoreCase(c)))
    if (a.explicit && present.size != a.columns.size)
      return Left("unknown columns: " +
        a.columns.filterNot(c => df.columns.exists(_.equalsIgnoreCase(c)))
          .mkString(","))
    // one pass for the reference's per-column mapping sizes
    val counts =
      if (present.isEmpty) Seq.empty
      else {
        val row = df.agg(countDistinct(col(present.head)).as(present.head),
          present.tail.map(c => countDistinct(col(c)).as(c)): _*).head()
        present.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }
      }
    val staged = a.warehouse + "_deidentifying"
    SlurmWarehouse.write(graft.slurm.Deidentify.relabelAll(df, present), staged)
    // rename-aside swap: no window destroys data before the staged
    // copy is live, and every crash point leaves a named directory
    val live = new org.apache.hadoop.fs.Path(a.warehouse + "/slurm")
    val aside = new org.apache.hadoop.fs.Path(a.warehouse + "/slurm_predeid")
    val stagedSlurm = new org.apache.hadoop.fs.Path(staged + "/slurm")
    if (!fs.rename(live, aside)) return Left(s"cannot stage aside $live")
    if (!fs.rename(stagedSlurm, live)) {
      fs.rename(aside, live) // roll back
      return Left(s"cannot move staged data into place")
    }
    fs.delete(aside, true)
    fs.delete(new org.apache.hadoop.fs.Path(staged), true)
    Right(counts)
  }

  def main(args: Array[String]): Unit = parse(args.toSeq) match {
    case Left(err) =>
      System.err.println(s"error: $err"); sys.exit(2)
    case Right(a) =>
      val spark = Cli.session()
      val r = run(spark, a)
      spark.stop()
      r match {
        case Left(err) => System.err.println(s"error: $err"); sys.exit(2)
        case Right(counts) => counts.foreach { case (c, n) =>
          println(s"colname=$c, mapped $n distinct values") }
      }
  }
}

/** `graft.tools.GraftCli ingest|sacct|seff|deidentify ...` — the
  * `python -m slurm2sql` dispatch (slurm2sql.py:1373-1378; bare
  * `slurm2sql` is the ingest command; deidentify is the reference's
  * sibling script surfaced as a subcommand). */
object GraftCli {
  def main(args: Array[String]): Unit = args.headOption match {
    case Some("sacct") => SacctCli.main(args.tail)
    case Some("seff") => SeffCli.main(args.tail)
    case Some("ingest") => IngestCli.main(args.tail)
    case Some("deidentify") => DeidentifyCli.main(args.tail)
    case _ =>
      System.err.println("usage: GraftCli {ingest|sacct|seff|deidentify} [options]")
      sys.exit(2)
  }
}
