package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{SlurmFunctions => F}
import graft.slurm.SlurmSim

/** Native TresExtractExpr must be value-identical to the regex form. */
class TresExtractSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  val fields = Seq("cpu", "mem", "billing", "gres/gpu", "gres/gpuutil",
    "gres/gpumem", "fs/disk", "energy", "absent")

  test("native == composed over the synthetic corpus") {
    val r = SlurmSim.raw(spark, "/root/testdata/sf0.001")
    Seq("AllocTRES", "TRESUsageInTot", "TRESUsageOutTot").foreach { c =>
      fields.foreach { f =>
        val diff = r.select(F.tresExtract(col(c), f).as("a"),
          F.tresExtractComposed(col(c), f).as("b"))
          .filter(!(col("a") <=> col("b"))).count()
        assert(diff == 0, s"$c / $f")
      }
    }
  }

  test("non-literal field fails analysis, not at runtime") {
    GraftFunctions.register(spark)
    val df = Seq(("cpu=4,mem=2048M", "cpu")).toDF("t", "f")
    df.createOrReplaceTempView("tres_neg_test")
    val e = intercept[Exception] {
      spark.sql("SELECT tres_extract(t, f) FROM tres_neg_test").collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable") ||
      e.getClass.getName.contains("Analysis"), e.getMessage)
  }

  test("non-string input fails analysis") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT tres_extract(42, 'cpu')").collect()
    }
    assert(e.getClass.getName.contains("Analysis") ||
      e.getMessage.toLowerCase.contains("string"), e.getMessage)
  }

  test("native == composed on adversarial strings") {
    val cases = Seq(
      "cpu=4,mem=2048M", "gres/gpumem=3", "mem=,cpu=1", "mem= ,x=1",
      "xmem=9,mem=5", "", "mem=5", "a,b,c", "mem=5,mem=7",
      "billing=12,cpu=00:25:00", "cpu=1,gres/gpu:a100=2,gres/gpu=2",
      "energy=0,fs/disk=123", "mem=tail", "=5,mem=8", ",mem=2,")
    val df = cases.toDF("v")
    fields.foreach { f =>
      val diff = df.select(col("v"), F.tresExtract(col("v"), f).as("a"),
        F.tresExtractComposed(col("v"), f).as("b"))
        .filter(!(col("a") <=> col("b")))
      assert(diff.count() == 0, s"$f: " + diff.collect().mkString(","))
    }
  }
}
