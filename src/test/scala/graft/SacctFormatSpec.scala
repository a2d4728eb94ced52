package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.slurm.SacctSource

/** The real sacct wire format: `-P --delimiter=';|;'` (multi-char
  * separator, no quoting, version-dependent columns). */
class SacctFormatSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def write(lines: Seq[String]): String = {
    val f = SparkTestSession.tmpFile("sacct", ".txt")
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("multi-char ;|; delimiter parses into the typed table") {
    val path = write(Seq(
      "JobID;|;JobName;|;User;|;State;|;Elapsed;|;NCPUS;|;AllocTRES;|;TRESUsageInTot",
      "100;|;train a;|;alice;|;COMPLETED;|;1:00:00;|;4;|;cpu=4,mem=8G;|;cpu=2:00:00,mem=4G",
      "100.batch;|;batch;|;;|;COMPLETED;|;1:00:00;|;4;|;cpu=4,mem=8G;|;cpu=2:00:00,mem=4G"))
    val t = SacctSource.loadSlurmTable(spark, path, sep = ";|;")
    assert(t.count() == 2)
    val r = t.filter(col("JobID") === "100").collect()(0)
    assert(r.getAs[String]("JobName") == "train a") // spaces survive, no quoting
    assert(r.getAs[Double]("Elapsed") == 3600.0)
    assert(r.getAs[Double]("CPUEff") == 0.5) // 2h used / (1h × 4 cpus)
    assert(r.getAs[Double]("MemEff") == 0.5)
    val step = t.filter(col("JobStep") === "batch").collect()
    assert(step.length == 1 && step(0).getAs[String]("User") == null) // '' → NULL
  }

  test("version drift: missing columns become NULL, extras are ignored") {
    val path = write(Seq(
      "JobID;|;SomeFutureColumn;|;Elapsed",
      "7;|;whatever;|;30:00"))
    val t = SacctSource.loadSlurmTable(spark, path, sep = ";|;")
    val r = t.collect()(0)
    assert(r.getAs[Double]("Elapsed") == 1800.0)
    assert(r.getAs[String]("User") == null)       // not in this dump
    assert(r.getAs[Any]("ReqMem") == null)
  }

  test("short/garbage rows don't poison the load") {
    val path = write(Seq(
      "JobID;|;User;|;Elapsed",
      "1;|;alice;|;10:00",
      "not-even-delimited",
      "2;|;bob;|;20:00"))
    val t = SacctSource.loadSlurmTable(spark, path, sep = ";|;")
    // all three data lines yield rows; the malformed one parses to
    // JobID='not-even-delimited' with NULL fields — quarantine by
    // filtering JobIDonly, the numeric key every real row has
    assert(t.count() == 3)
    assert(t.filter(col("JobIDonly").isNotNull).count() == 2)
  }
}
