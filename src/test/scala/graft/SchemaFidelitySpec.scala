package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.slurm.{SlurmSim, SlurmTable}

/** The slurm table must expose exactly the reference's schema: every
  * key of COLUMNS (slurm2sql.py:580-687) with the `_` prefix stripped —
  * a user's SQL written against the reference's sqlite db keeps
  * resolving. */
class SchemaFidelitySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  // The COMPLETE COLUMNS key set, underscores stripped (reference order,
  // slurm2sql.py:580-687), plus the stored COLUMNS_EXTRA pass-through
  // TRESUsageInAve (slurm2sql.py:694) — no omissions: any `SELECT col
  // FROM slurm` a reference user runs must resolve here.
  val referenceColumns = Seq(
    "JobID", "JobIDnostep", "JobIDonly", "JobStep", "ArrayTaskID",
    "JobIDRawonly", "JobName", "User", "Group", "Account", "SubmitLine",
    "Billing", "State", "Timelimit", "Elapsed", "Time", "Submit", "Start",
    "End", "QueueTime", "Partition", "ExitCodeRaw", "ExitCode",
    "ExitSignal", "NodeList", "Priority", "ConsumedEnergy", "ReqNodes",
    "NNodes", "AllocNodes", "ReqTRES", "NTasks", "AllocTRES",
    "TRESUsageInTot", "TRESUsageInAve", "TRESUsageOutTot",
    "NCPUS", "ReqCPUS", "AllocCPUS",
    "CPUTime", "TotalCPU", "UserCPU", "SystemCPU", "CPUEff",
    "MinCPU", "MinCPUNode", "MinCPUTask",
    "TotalMem", "AllocMem", "MemEff", "ReqMem", "ReqMemNode", "ReqMemCPU",
    "AveRSS", "MaxRSS", "MaxRSSNode", "MaxRSSTask",
    "MaxPages", "MaxVMSize", "AveDiskRead",
    "AveDiskWrite", "MaxDiskRead", "MaxDiskWrite", "TotDiskRead",
    "TotDiskWrite", "ReqGPUS", "Comment", "GpuEff", "NGpus", "GpuType",
    "GpuUtil", "GpuMem", "GpuUtilTot", "GpuMemTot")

  test("SlurmTable exposes every reference column (and no dupes)") {
    val t = SlurmTable.build(SlurmSim.raw(spark, "/root/testdata/sf0.001"))
    val got = t.columns.toSeq
    val missing = referenceColumns.filterNot(c =>
      got.exists(_.equalsIgnoreCase(c)))
    assert(missing.isEmpty, s"missing columns: $missing")
    assert(got.distinct.size == got.size, "duplicate columns")
  }

  test("pass-through node/task columns carry sacct values verbatim") {
    import spark.implicits._
    val raw = Seq(
      ("1", "nid001", "0", "nid002", "3", "cpu=00:01:00,mem=1M"),
      ("2", "", "", "", "", "")).toDF(
      "JobID", "MinCPUNode", "MinCPUTask", "MaxRSSNode", "MaxRSSTask",
      "TRESUsageInAve")
    val t = SlurmTable.build(raw)
    val r1 = t.filter(col("JobID") === "1")
      .select("MinCPUNode", "MinCPUTask", "MaxRSSNode", "MaxRSSTask",
        "TRESUsageInAve").collect()(0)
    assert(r1.toSeq == Seq("nid001", "0", "nid002", "3", "cpu=00:01:00,mem=1M"))
    // empty string → NULL (reference nullstr semantics)
    val r2 = t.filter(col("JobID") === "2")
      .select("MinCPUNode", "MaxRSSTask", "TRESUsageInAve").collect()(0)
    assert((0 until 3).forall(r2.isNullAt))
  }

  test("SQL-first surface: registered functions + views answer raw SQL") {
    GraftFunctions.register(spark)
    val t = SlurmTable.build(SlurmSim.raw(spark, "/root/testdata/sf0.001"),
      lit(1750000000L))
    GraftFunctions.registerSlurmViews(spark,
      SlurmTable.build(SlurmSim.jsRaw(spark, "/root/testdata/sf0.001"),
        lit(1750000000L)))
    val f = spark.sql(
      "SELECT slurm_time('1-02:00:00') AS a, tres_extract('cpu=4,mem=8G', 'mem') AS b")
      .collect()(0)
    assert(f.getDouble(0) == 93600.0)
    assert(f.getString(1) == "8G")
    assert(spark.sql("SELECT * FROM eff WHERE CPUeff IS NOT NULL").count() > 0)
    assert(spark.sql("SELECT count(*) FROM allocations").collect()(0).getLong(0) > 0)
  }

  test("reference sqlite-style SQL keeps resolving against the table") {
    val t = SlurmTable.build(SlurmSim.raw(spark, "/root/testdata/sf0.001"),
      lit(1750000000L))
    t.createOrReplaceTempView("slurm")
    // straight from the reference README / seff queries
    val r = spark.sql("""
      SELECT User, sum(Elapsed * NCPUS) AS cpu_s,
             avg(CPUEff) AS avg_eff, max(MemEff) AS max_mem_eff
      FROM slurm WHERE State != 'RUNNING' AND JobStep IS NULL
      GROUP BY User ORDER BY cpu_s DESC LIMIT 5""")
    assert(r.count() == 5)
  }
}
