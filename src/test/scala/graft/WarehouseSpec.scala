package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.slurm.{SlurmSim, SlurmTable, SlurmWarehouse}

/** Warehouse layout: day-partitioned parquet + resume bookmark — the
  * reference's sqlite file + indexes + meta_slurm_lastupdate. */
class WarehouseSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("write/read round-trip with day partitioning and pruning") {
    val dir = Files.createTempDirectory("graft_wh").toString
    val slurm = SlurmTable.build(SlurmSim.raw(spark, "/root/testdata/sf0.001"),
      lit(1750000000L))
    SlurmWarehouse.write(slurm, dir)
    val back = SlurmWarehouse.read(spark, dir)
    assert(back.count() == slurm.count())
    // partition dirs exist per day
    val days = new java.io.File(s"$dir/slurm").listFiles()
      .filter(_.getName.startsWith("time_day=")).map(_.getName)
    assert(days.length > 1)
    // a day filter prunes to that partition's files (scan reads subset)
    val oneDay = days.head.stripPrefix("time_day=")
    val pruned = back.filter(col("time_day") === oneDay)
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(planStr.contains("PartitionFilters") || pruned.count() < back.count())
  }

  test("resume bookkeeping: second load appends only newer rows") {
    val dir = Files.createTempDirectory("graft_wh2").toString
    val slurm = SlurmTable.build(SlurmSim.raw(spark, "/root/testdata/sf0.001"),
      lit(1750000000L)).cache()
    val cutoff = slurm.agg(expr("percentile_approx(Time, 0.5)")).collect()(0)
      .getLong(0)
    val first = slurm.filter(col("Time") <= cutoff)
    SlurmWarehouse.write(first, dir)
    SlurmWarehouse.updateLastTimestamp(spark, dir, cutoff)
    val appended = SlurmWarehouse.resumeAppend(spark, slurm, dir)
    val total = SlurmWarehouse.read(spark, dir).count()
    assert(total == first.count() + slurm.filter(col("Time") > cutoff).count())
    assert(appended >= cutoff)
    assert(SlurmWarehouse.lastTimestamp(spark, dir).contains(appended))
  }
}
