package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.slurm.{SacctSource, SlurmViews}

/** End-to-end ingest of the reference's own CSV fixtures
  * (/root/reference/tests/test-data{1,3}.csv) into the typed slurm
  * table — the Spark twin of test.py:91-118.
  *
  * Timestamps: the reference parses in server-local time (its tests pin
  * TZ=Europe/Helsinki); graft standardizes on UTC (SURVEY §4), so epoch
  * assertions here are the UTC equivalents.
  */
class SacctIngestSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  val data1 = "/root/reference/tests/test-data1.csv"
  val data3 = "/root/reference/tests/test-data3.csv"

  lazy val slurm1 = SacctSource.loadSlurmTable(spark, data1, sep = "|").cache()

  test("test-data1 loads all rows with JobName/Start parsed") {
    val r = slurm1.filter(col("JobID") === "43974388")
      .select("JobName", "Start").collect()(0)
    assert(r.getString(0) == "spawner-jupyterhub")
    // reference asserts 1564601354 under Europe/Helsinki (UTC+3);
    // UTC parse of 2019-07-31T22:29:14 is 3h later
    assert(r.getLong(1) == 1564601354L + 3 * 3600)
    assert(slurm1.count() == 5)
  }

  test("jobs-only filter leaves the two allocation rows") {
    assert(SlurmViews.allocations(slurm1).count() == 2)
    assert(SlurmViews.steps(slurm1).count() == 3)
  }

  test("typed columns: memory, time, exit codes") {
    val r = slurm1.filter(col("JobID") === "43974388.batch")
      .select("MaxRSS", "Elapsed", "ExitSignal", "NCPUS").collect()(0)
    assert(r.getDouble(0) == 231092.0 * 1024) // 231092K
    assert(r.getDouble(1) == 3 * 3600 + 33 * 60 + 56.0) // 03:33:56
    assert(r.getInt(2) == 9) // 0:9
    assert(r.getLong(3) == 2L)
  }

  test("queue time = start - submit") {
    val r = slurm1.filter(col("JobID") === "43974388")
      .select("QueueTime").collect()(0)
    assert(r.getLong(0) == 1L) // reference test_queuetime
  }

  test("test-data3 (plain CSV) ingests") {
    val s3 = SacctSource.loadSlurmTable(spark, data3)
    val r = s3.filter(col("JobID") === "1").select("JobName", "Start").collect()(0)
    assert(r.getString(0) == "job1")
    // fixture Start = 1970-01-01T03:00:00; reference asserts 3600 under
    // Helsinki (UTC+2 in 1970) — in UTC that string is epoch 10800
    assert(r.getLong(1) == 10800L)
  }

  test("embedded newline in JobName reassembles to ONE row (slurm2sql.py:888-905)") {
    val dir = SparkTestSession.tmpDir("sacct_nl").toFile
    val f = new java.io.File(dir, "dump.txt")
    val w = new java.io.PrintWriter(f)
    w.print(
      """JobID;|;JobName;|;User;|;State
        |1;|;plain job;|;alice;|;COMPLETED
        |2;|;name with
        |an embedded
        |newline;|;bob;|;FAILED
        |3;|;tail job;|;carol;|;COMPLETED
        |""".stripMargin)
    w.close()
    val df = SacctSource.readReassembled(spark, f.getAbsolutePath).cache()
    assert(df.count() == 3)
    val r2 = df.filter(col("JobID") === "2").collect()(0)
    assert(r2.getAs[String]("JobName") == "name with\nan embedded\nnewline")
    assert(r2.getAs[String]("User") == "bob")
    assert(df.filter(col("JobID") === "3")
      .select("JobName").head().getString(0) == "tail job")
    // feeds straight into the typed table
    val t = graft.slurm.SlurmTable.build(df)
    assert(t.filter(col("JobName").contains("\n")).count() == 1)
    df.unpersist()
  }

  test("reassembly quarantines a trailing incomplete fragment") {
    val dir = SparkTestSession.tmpDir("sacct_frag").toFile
    val f = new java.io.File(dir, "dump.txt")
    val w = new java.io.PrintWriter(f)
    w.print("JobID;|;JobName;|;User\n1;|;ok;|;alice\n2;|;dangling\n")
    w.close()
    val df = SacctSource.readReassembled(spark, f.getAbsolutePath)
    assert(df.count() == 1)
    assert(df.head().getString(0) == "1")
  }

  test("reassembly on a newline-free dump equals the quarantine reader") {
    // same rows either way when nothing needs gluing (reference fixture)
    val a = SacctSource.readReassembled(spark, data1, sep = "|")
    val b = SacctSource.readDelimited(spark, data1, sep = "|").drop("_corrupt")
    assert(a.count() == b.count())
    assert(a.columns.toSeq == b.columns.toSeq)
    val cols = a.columns.map(col)
    assert(a.select(cols: _*).except(b.select(cols: _*)).count() == 0)
  }

  test("state-category selectors match the reference code sets") {
    import graft.slurm.{Reports, SlurmStates}
    // test-data1 states: CANCELLED by 1300204, CANCELLED, COMPLETED ×2
    assert(Reports.sacct(slurm1, states = Some(SlurmStates.CANCELLED)).count() == 3)
    assert(Reports.sacct(slurm1, states = Some(SlurmStates.COMPLETED)).count() == 2)
    assert(Reports.sacct(slurm1, states = Some(SlurmStates.ENDED)).count() == 5)
    assert(Reports.sacct(slurm1, states = Some(SlurmStates.FAILED)).count() == 0)
    // --running-at-time, a minute after the first Start (UTC epochs):
    // job 43974388 + its batch step are running; the .0 step hasn't
    // started, job 43977780 starts later, its batch has Unknown Start
    val t1 = 1564601354L + 3 * 3600 + 60
    assert(Reports.sacct(slurm1, runningAtTime = Some(t1)).count() == 2)
    // later the same night: 43977780 has started (End Unknown → still
    // running), the .0 step already ended at its own Start instant
    val t2 = t1 + 3 * 3600
    assert(Reports.sacct(slurm1, runningAtTime = Some(t2)).count() == 3)
    assert(Reports.sacct(slurm1, runningAtTime = Some(0L)).count() == 0)
    // selectors compose with the user filter: both allocation rows are
    // user1 + 'CANCELLED by', the step rows carry no user
    assert(Reports.sacct(slurm1, user = Some("user1"),
      states = Some(SlurmStates.CANCELLED)).count() == 2)
  }

  test("--partition pattern: glob anchors, plain pattern stays substring (reference parity)") {
    import graft.slurm.Reports
    import spark.implicits._
    val df = Seq("gpu_a100", "biggpu", "gpu", "gpu1", "cpu_small").toDF("Partition")
    def names(p: String) =
      Reports.sacct(df, partition = Some(p)).collect().map(_.getString(0)).toSet
    // glob (slurm2sql.py:1198 "a raw glob match"): anchored, * spans any run
    assert(names("gpu*") == Set("gpu_a100", "gpu", "gpu1"))
    // ? is exactly one character
    assert(names("gpu?") == Set("gpu1"))
    // no metacharacters -> the reference's args_to_sql_where substring
    // behavior (slurm2sql.py:1075)
    assert(names("gpu") == Set("gpu_a100", "biggpu", "gpu", "gpu1"))
    // a literal _ in the pattern is NOT a single-char wildcard
    assert(names("u_a") == Set("gpu_a100"))
  }

  test("eff view rolls steps into the job") {
    val eff = SlurmViews.eff(slurm1)
    assert(eff.count() == 2)
    val r = eff.filter(col("JobID") === "43974388").collect()(0)
    assert(r.getAs[Long]("NCPUS") == 2L)
  }
}
