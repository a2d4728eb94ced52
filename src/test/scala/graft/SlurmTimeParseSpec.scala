package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{SlurmFunctions => F}
import graft.slurm.SlurmSim

/** The native SlurmTimeParse expression must be value-identical to the
  * composed-built-ins form on every string the engine can meet. */
class SlurmTimeParseSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("native == composed on the whole synthetic corpus") {
    val r = SlurmSim.raw(spark, "/root/testdata/sf0.001")
    Seq("Elapsed", "Timelimit").foreach { c =>
      val diff = r.select(F.slurmTime(col(c)).as("a"),
        F.slurmTimeComposed(col(c)).as("b"))
        .filter(!(col("a") <=> col("b"))).count()
      assert(diff == 0, s"column $c")
    }
  }

  test("native == composed on adversarial edge strings") {
    val cases = Seq("1:00:00", "3-13:10", "3-13", "10", "00:15.057",
      "UNLIMITED", "Partition_Limit", "", " ", "garbage", "1:", ":5",
      "1-2-3", "3-", "1:2:3:4", "+5", "-", "0", "00:00:00", "59:59",
      "1000000", "12:00.5", "7-00:00:00")
    val df = cases.toDF("v")
    val diff = df.select(F.slurmTime(col("v")).as("a"),
      F.slurmTimeComposed(col("v")).as("b"), col("v"))
      .filter(!(col("a") <=> col("b")))
    assert(diff.count() == 0, diff.collect().mkString(","))
  }
}
