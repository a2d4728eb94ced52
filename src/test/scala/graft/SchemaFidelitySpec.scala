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

  // COLUMNS keys, underscores stripped (reference order)
  val referenceColumns = Seq(
    "JobID", "JobIDnostep", "JobIDonly", "JobStep", "ArrayTaskID",
    "JobIDRawonly", "JobName", "User", "Group", "Account", "SubmitLine",
    "Billing", "State", "Timelimit", "Elapsed", "Time", "Submit", "Start",
    "End", "QueueTime", "Partition", "ExitCodeRaw", "ExitCode",
    "ExitSignal", "NodeList", "Priority", "ConsumedEnergy", "ReqNodes",
    "NNodes", "AllocNodes", "ReqTRES", "NTasks", "AllocTRES",
    "TRESUsageInTot", "TRESUsageOutTot", "NCPUS", "ReqCPUS", "AllocCPUS",
    "CPUTime", "TotalCPU", "UserCPU", "SystemCPU", "CPUEff", "MinCPU",
    "TotalMem", "AllocMem", "MemEff", "ReqMem", "ReqMemNode", "ReqMemCPU",
    "AveRSS", "MaxRSS", "MaxPages", "MaxVMSize", "AveDiskRead",
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
    // MinCPUNode/MinCPUTask/MaxRSSNode/... are pass-through sacct text
    // columns the reference also carries; graft keeps the computed set
    // plus raw TRES strings — SQL on any reference-computed column works
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
