package graft.tools

import org.apache.spark.sql.SparkSession

/** Simulates the driver's t1 smoke: a DEFAULT-config session (ANSI on,
  * 200 shuffle partitions — nothing from Tables.session) calling
  * SparkEntry.entry. Guards against configs we quietly rely on. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"entry rows=$n schema=${df.schema.fieldNames.length} cols")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
