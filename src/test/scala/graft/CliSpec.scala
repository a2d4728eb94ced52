package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.slurm.{Reports, SlurmSim, SlurmStates, SlurmTable, SlurmViews, SlurmWarehouse}
import graft.tools.Cli

/** graft-sacct / graft-seff flag semantics vs the Reports API the
  * oracle gate already checks (s22-s27): each CLI combination must be
  * the SAME frame the API call produces — the CLI is a parser +
  * projection layer, never new query logic. Mirrors
  * slurm2sql.py:1160-1371 (sacct_cli/seff_cli). */
class CliSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  /** One warehouse for the whole suite (the --db path). */
  lazy val wh: String = {
    val dir = SparkTestSession.tmpDir("graft_cli_wh").toString
    val slurm = SlurmTable.build(SlurmSim.jsRaw(spark, "/root/testdata/sf0.001"),
      lit(1750000000L))
    SlurmWarehouse.write(slurm, dir)
    dir
  }
  lazy val slurm = SlurmWarehouse.read(spark, wh)

  private def sacct(args: String*): org.apache.spark.sql.DataFrame =
    Cli.sacctFrame(spark, Cli.parse(Seq("--db", wh) ++ args).toOption.get)
      .toOption.get
  private def seff(args: String*): org.apache.spark.sql.DataFrame =
    Cli.seffFrame(spark, Cli.parse(Seq("--db", wh) ++ args).toOption.get)
      .toOption.get

  test("parse: input required, state selectors mutually exclusive, unknown flag rejected") {
    assert(Cli.parse(Seq("-u", "user_7")).isLeft)
    assert(Cli.parse(Seq("--db", wh, "--ended", "--failed")).isLeft)
    assert(Cli.parse(Seq("--db", wh, "--running-at-time", "123", "--ended")).isLeft)
    assert(Cli.parse(Seq("--db", wh, "--no-such-flag")).isLeft)
    assert(Cli.parse(Seq("--db", wh, "--format", "fancy_grid")).isLeft)
    // reference argparse accepts --flag=value too
    assert(Cli.parse(Seq(s"--db=$wh", "-u", "user_7")).toOption.get.user
      .contains("user_7"))
  }

  test("parse: --running-at-time accepts epoch and ISO datetime (UTC)") {
    assert(Cli.parseTime("1750000000") == Right(1750000000L))
    assert(Cli.parseTime("2026-01-02 03:04") == Right(
      java.time.LocalDateTime.of(2026, 1, 2, 3, 4)
        .toEpochSecond(java.time.ZoneOffset.UTC)))
    assert(Cli.parseTime("2026-01-02") == Right(
      java.time.LocalDate.of(2026, 1, 2).atStartOfDay
        .toEpochSecond(java.time.ZoneOffset.UTC)))
    assert(Cli.parseTime("whenever").isLeft)
  }

  test("sacct: default field list, --user filter matches Reports.sacct") {
    val df = sacct("-u", "user_7")
    assert(df.columns.toSeq == Cli.SACCT_DEFAULT)
    assert(df.count() ==
      Reports.sacct(slurm, user = Some("user_7")).count())
    assert(df.count() > 0)
    // Start renders as the reference's datetime(Start,'unixepoch')
    val s = df.filter(col("Start").isNotNull).select("Start").head.getString(0)
    assert(s.matches("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}"), s)
  }

  test("sacct: --output list + --order col desc") {
    val df = sacct("-o", "jobid,user,ncpus", "--order", "NCPUS desc, JobID")
    // case-insensitive resolution keeps the TABLE's column names (SQLite)
    assert(df.columns.toSeq == Seq("JobID", "User", "NCPUS"))
    val ncpus = df.select("NCPUS").collect().map(_.getLong(0))
    assert(ncpus.sameElements(ncpus.sortBy(-_)))
    // unknown column is a parse-stage error, not an AnalysisException
    assert(Cli.sacctFrame(spark,
      Cli.parse(Seq("--db", wh, "-o", "NoSuchCol")).toOption.get).isLeft)
    assert(Cli.sacctFrame(spark,
      Cli.parse(Seq("--db", wh, "--order", "NoSuchCol")).toOption.get).isLeft)
  }

  test("sacct: --output long and '*' field lists") {
    assert(sacct("-o", "long").columns.toSeq == Cli.SACCT_DEFAULT_LONG)
    assert(sacct("-o", "*").columns.toSeq == slurm.columns.toSeq)
  }

  test("sacct: --completed / --failed state categories match the name sets") {
    val done = sacct("--completed")
    assert(done.count() == slurm.filter(col("State") === "COMPLETED").count())
    val failed = sacct("--failed", "-o", "JobID,State")
    val states = failed.select("State").distinct().collect().map(_.getString(0)).toSet
    assert(states.nonEmpty && states.subsetOf(
      Set("FAILED", "NODE_FAIL", "OUT_OF_MEMORY", "TIMEOUT")))
    assert(failed.count() ==
      Reports.sacct(slurm, states = Some(SlurmStates.FAILED)).count())
  }

  test("sacct: --running-at-time = Start<=T<End with NULL End running") {
    val t = slurm.agg(expr("percentile_approx(Start, 0.5)")).head.getLong(0)
    val df = sacct("--running-at-time", t.toString, "-o", "JobID,Start,End")
    val expected = slurm.filter(col("Start") <= t &&
      (col("End").isNull || col("End") > t)).count()
    assert(df.count() == expected && expected > 0)
  }

  test("sacct: --partition substring and glob forms") {
    // plain pattern: substring (the reference's LIKE '%'||p||'%')
    assert(sacct("-r", "gpu").count() ==
      slurm.filter(col("Partition").contains("gpu")).count())
    // glob pattern: anchored — 'inter*' matches interactive only
    assert(sacct("-r", "inter*").count() ==
      slurm.filter(col("Partition").startsWith("inter")).count())
  }

  test("sacct: positional JobID selects that job's rows") {
    val id = slurm.filter(col("JobStep").isNotNull)
      .select("JobIDonly").head.getLong(0)
    val df = sacct(s"$id.0", "-o", "JobID,JobIDonly")
    assert(df.count() ==
      slurm.filter(col("JobIDonly") === id).count())
    assert(df.select(col("JobIDonly")).distinct().count() == 1)
  }

  test("sacct_filter passthrough: --jobs/--state/--account and key=value positionals") {
    // --jobs= comma list selects exactly those jobs' rows
    val ids = slurm.select("JobIDonly").distinct().limit(2)
      .collect().map(_.getLong(0))
    assert(sacct(s"--jobs=${ids.mkString(",")}").count() ==
      slurm.filter(col("JobIDonly").isin(ids.map(Long.box): _*)).count())
    // --state accepts the two-letter sacct code and the full name
    assert(sacct("--state=CD").count() ==
      slurm.filter(col("State") === "COMPLETED").count())
    assert(sacct("--state=COMPLETED").count() == sacct("--state=CD").count())
    // bare key=value positional (args_to_sacct_filter shape) — the sim
    // carries one account per user group; filter on whatever exists
    val acct = slurm.select("Account")
      .filter(col("Account").isNotNull && col("Account") =!= "")
      .head.getString(0)
    assert(sacct(s"account=$acct").count() ==
      slurm.filter(col("Account") === acct).count())
    // tokens AND together: state + user
    val u = slurm.filter(col("User").isNotNull).select("User").head.getString(0)
    assert(sacct("--state=CD", s"user=$u").count() ==
      slurm.filter(col("State") === "COMPLETED" && col("User") === u).count())
    // unknown keys still rejected, never silently dropped
    assert(Cli.parse(Seq("--db", wh, "--nodelist=n1")).isLeft)
    assert(Cli.parse(Seq("--db", wh, "nodelist=n1")).isLeft)
    // seff path applies the same filters pre-rollup
    assert(seff(s"--jobs=${ids.head}").count() <= seff().count())
  }

  test("seff: per-job equals Reports.seffPerJob; --long adds Start/End") {
    val eff = SlurmViews.eff(slurm)
    assert(seff().count() == Reports.seffPerJob(eff).count())
    val l = seff("-l")
    assert(l.columns.contains("StartT") && l.columns.contains("EndT"))
    assert(l.count() == Reports.seffPerJob(eff).count())
    val st = l.filter(col("StartT").isNotNull).select("StartT").head.getString(0)
    assert(st.matches("\\d{2}-\\d{2}_\\d{2}:\\d{2}"), st) // strftime('%m-%d_%H:%M')
  }

  test("seff: --aggregate-user + --order days desc equals Reports.seffPerUser") {
    val df = seff("--aggregate-user", "--order", "days desc")
    val api = Reports.seffPerUser(SlurmViews.eff(slurm))
    assert(df.count() == api.count())
    assert(df.columns.toSeq == api.columns.toSeq)
    val days = df.select("days").collect().map(_.getDouble(0))
    assert(days.sameElements(days.sortBy(-(_: Double))))
  }

  test("seff: --user filters the eff view (reference WHERE on eff)") {
    val df = seff("-u", "user_3")
    val api = Reports.seffPerJob(SlurmViews.eff(slurm))
      .filter(col("User") === "user_3")
    assert(df.count() == api.count() && df.count() > 0)
  }

  test("csv input path builds the same table as the warehouse") {
    // round-trip the sim's raw sacct strings through a CSV file — the
    // reference's --csv-input (slurm2sql.py:1181)
    val csvDir = SparkTestSession.tmpDir("graft_cli_csv").toString + "/raw"
    SlurmSim.raw(spark, "/root/testdata/sf0.001")
      .coalesce(1).write.option("header", "true").mode("overwrite").csv(csvDir)
    val a = Cli.parse(Seq("--csv-input", csvDir, "-u", "user_7")).toOption.get
    val df = Cli.sacctFrame(spark, a).toOption.get
    val direct = SlurmTable.build(SlurmSim.raw(spark, "/root/testdata/sf0.001"))
      .filter(col("User") === "user_7")
    assert(df.count() == direct.count() && df.count() > 0)
  }

  test("seff empty result exits 2 for EVERY format (the simple header is not data)") {
    // the reference prints 'No data fetched' + exit 2 (:1327); the
    // check counts DATA rows per format — 'simple' always renders a
    // header + separator, so a newline test would never fire
    val empty = seff("-u", "no_such_user_xyz")
    assert(empty.limit(1).count() == 0)
    for (fmt <- Seq("simple", "csv", "tsv", "json")) {
      val rendered = Cli.render(empty, fmt, None)
      val bodyRows = fmt match {
        case "simple" => rendered.linesIterator.size - 2
        case "csv" | "tsv" => rendered.linesIterator.size - 1
        case _ => rendered.linesIterator.count(_.nonEmpty)
      }
      assert(bodyRows <= 0, s"format $fmt: $rendered")
    }
  }

  test("json rendering escapes backslashes and control chars; parseTime rejects empty") {
    import spark.implicits._
    val df = Seq(("a\\b", "x\ny")).toDF("A", "B")
    val json = Cli.render(df, "json", None)
    // must parse as JSON: backslash doubled, newline escaped
    assert(json.contains("\"a\\\\b\"") && json.contains("\"x\\ny\""))
    assert(Cli.parseTime("").isLeft)
  }

  test("render: csv/json/tsv/simple shapes") {
    val df = sacct("-o", "JobID,User,NCPUS", "--limit", "5")
    val csv = Cli.render(df, "csv", Some(3))
    assert(csv.linesIterator.next() == "JobID,User,NCPUS")
    assert(csv.linesIterator.size == 4)
    val json = Cli.render(df, "json", Some(2))
    assert(json.linesIterator.size == 2 &&
      json.linesIterator.next().startsWith("{\"JobID\":"))
    val simple = Cli.render(df, "simple", Some(2))
    assert(simple.linesIterator.size == 4) // header + sep + 2 rows
    val tsv = Cli.render(df, "tsv", Some(1))
    assert(tsv.linesIterator.next() == "JobID\tUser\tNCPUS")
  }
}
