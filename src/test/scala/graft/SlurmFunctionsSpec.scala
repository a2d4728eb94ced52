package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{SlurmFunctions => F}

/** Unit semantics for every converter — the same cases the reference's
  * own test suite pins down (/root/reference/test.py:297-350). */
class SlurmFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTestSession.get
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): Any =
    Seq("x").toDF("dummy").select(c).collect()(0).get(0)

  private def parse(fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                    v: String): Any =
    Seq(v).toDF("v").select(fn(col("v"))).collect()(0).get(0)

  test("slurmtime: reference test matrix") {
    val cases = Seq(
      "1:00:00" -> 3600.0, "1:10:00" -> 4200.0, "1:00:10" -> 3610.0,
      "00:10" -> 10.0, "10:10" -> 610.0, "10" -> 600.0,
      "3-10:00" -> (3600.0 * 24 * 3 + 10 * 3600),
      "3-13:10:00" -> (3600.0 * 24 * 3 + 13 * 3600 + 600),
      "3-13:10" -> (3600.0 * 24 * 3 + 13 * 3600 + 600),
      "3-13" -> (3600.0 * 24 * 3 + 13 * 3600))
    cases.foreach { case (in, want) =>
      assert(parse(F.slurmTime, in) == want, s"slurmtime($in)")
    }
    assert(parse(F.slurmTime, "UNLIMITED") == null)
    assert(parse(F.slurmTime, "Partition_Limit") == null)
    assert(parse(F.slurmTime, "") == null)
    // fractional seconds (sacct TotalCPU style)
    assert(parse(F.slurmTime, "00:15.057") == 15.057)
  }

  test("binary units (reference test_binary_units)") {
    Seq("2k" -> 2048.0, "2M" -> (2.0 * (1L << 20)), "2G" -> (2.0 * (1L << 30)),
      "2t" -> (2.0 * (1L << 40)), "2P" -> (2.0 * (1L << 50)), "3" -> 3.0,
      "0.00K" -> 0.0, "85399.46K" -> (85399.46 * 1024)).foreach {
      case (in, want) => assert(parse(F.floatBytes, in) == want, s"floatBytes($in)")
    }
    assert(parse(F.intBytes, "2k") == 2048L)
  }

  test("metric units (reference test_metric_units)") {
    Seq("2k" -> 2000.0, "2M" -> 2e6, "2G" -> 2e9, "2T" -> 2e12, "2p" -> 2e15)
      .foreach { case (in, want) =>
        assert(parse(F.floatMetric, in) == want, s"floatMetric($in)")
      }
    assert(parse(F.intMetric, "2M") == 2000000L)
  }

  test("slurmmem strips n/c suffix") {
    assert(parse(F.slurmMem, "2252800K") == 2252800.0 * 1024)
    assert(parse(F.slurmMem, "512000Kn") == 512000.0 * 1024)
    assert(parse(F.slurmMem, "10Gc") == 10.0 * (1L << 30))
  }

  test("jobid decomposition (reference jobid_test_data)") {
    val cases = Seq(
      // text, JobIDonly, ArrayTaskID, JobStep
      ("7099567_5035", 7099567L, 5035L, null),
      ("7102250", 7102250L, null, null),
      ("1000.2", 1000L, null, "2"),
      ("1000_2", 1000L, 2L, null),
      ("1000_2.3", 1000L, 2L, "3"),
      ("1000+2", 1000L, null, null),
      ("1000+2.3", 1000L, null, "3"),
      ("1000_2+3", 1000L, 2L, null),
      ("1000_2+3.1", 1000L, 2L, "1"))
    cases.foreach { case (in, idOnly, arrTask, step) =>
      assert(parse(F.jobIdOnly, in) == idOnly, s"jobIdOnly($in)")
      assert(parse(F.arrayTaskId, in) == arrTask, s"arrayTaskId($in)")
      assert(parse(F.jobStep, in) == step, s"jobStep($in)")
    }
    assert(parse(F.jobIdRawOnly, "7102250.1") == 7102250L)
  }

  test("tres extraction does not cross field boundaries") {
    val tres = "billing=12,cpu=4,mem=2048M,gres/gpu=2,gres/gpu:a100=2,gres/gpumem=999M"
    def ex(f: String) =
      Seq(tres).toDF("v").select(F.tresExtract(col("v"), f)).collect()(0).get(0)
    assert(ex("mem") == "2048M")          // not gres/gpumem
    assert(ex("gres/gpumem") == "999M")
    assert(ex("cpu") == "4")
    assert(ex("gres/gpu") == "2")
    assert(ex("absent") == null)
  }

  test("unixtime handles Unknown/None (UTC)") {
    assert(parse(F.unixTime, "1970-01-01T00:01:00") == 60L)
    assert(parse(F.unixTime, "Unknown") == null)
    assert(parse(F.unixTime, "None") == null)
  }

  test("exit code split") {
    assert(parse(F.exitCode, "0:9") == 0)
    assert(parse(F.exitSignal, "0:9") == 9)
    assert(parse(F.exitCode, "") == null)
  }

  test("cpu/mem/gpu efficiency (reference test_cpueff/memeff/gpueff)") {
    // reference test_cpueff: Elapsed 50:00, cpu alloc 1, used 25:00 → 0.5
    val df = Seq(("50:00", "cpu=1,mem=1000K", "cpu=25:00,mem=500K,gres/gpuutil=23"))
      .toDF("el", "alloc", "used")
    val r = df.select(
      F.cpuEff(col("el"), col("alloc"), col("used")).as("c"),
      F.memEff(col("alloc"), col("used")).as("m")).collect()(0)
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) == 0.5)
    // reference test_gpueff: 1 gpu, util 23 → 0.23
    val g = Seq(("gres/gpu=1", "gres/gpuutil=23")).toDF("alloc", "used")
      .select(F.gpuEff(col("alloc"), col("used"))).collect()(0)
    assert(g.getDouble(0) == 0.23)
    // zero-alloc mem → NULL (reference test_memeff row 2)
    val z = Seq(("mem=0K", "mem=0K")).toDF("alloc", "used")
      .select(F.memEff(col("alloc"), col("used"))).collect()(0)
    assert(z.get(0) == null)
  }

  test("seff per-job filters on End ONLY: cancelled-never-started jobs are listed") {
    // slurm2sql.py:1335 — `WHERE End IS NOT NULL`; a job cancelled
    // before starting has End set but NO Start, and the reference
    // still shows it
    val eff = Seq(
      ("1", "u", Some(100L), Some(1000L), Some(1100L), "COMPLETED"),
      ("2", "u", Some(0L), None, Some(1100L), "CANCELLED"), // never started
      ("3", "u", None, Some(1000L), None, "RUNNING"))       // no End -> dropped
      .toDF("JobID", "User", "Elapsed", "Start", "End", "State")
      .withColumn("NCPUS", lit(1L)).withColumn("CPUeff", lit(0.5))
      .withColumn("AllocMem", lit(1073741824L)).withColumn("TotalMem", lit(1073741824L))
      .withColumn("MemEff", lit(0.5)).withColumn("NGpus", lit(0L))
      .withColumn("GpuEff", lit(null).cast("double"))
      .withColumn("TotDiskRead", lit(0L)).withColumn("TotDiskWrite", lit(0L))
    val got = graft.slurm.Reports.seffPerJob(eff)
      .select("JobID").collect().map(_.getString(0)).toSet
    assert(got == Set("1", "2"))
  }
}
