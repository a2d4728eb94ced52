package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables

/** Pins the watermark-lag semantics: wave w holds one event per hour
  * 1..(10*(w+1)), so each wave's max event time strictly increases.
  * Which hours of waves 1 and 2 survive tells us exactly which
  * batch's stats the filtering watermark reflects. */
object StreamProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("stream-probe2", "4")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("probe_win2")
    (0 until 3).foreach { w =>
      val rows = (1 to 10 * (w + 1)).map(h =>
        (h.toLong + 1000L * w, new java.sql.Timestamp(
          java.time.Instant.parse("2024-01-01T00:00:01Z")
            .plusSeconds(h * 3600L).toEpochMilli),
          s"t$w", 1.0))
      val tmp = base.resolve(s"_w$w").toString
      rows.toDF("event_id", "ts", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, base.resolve(s"wave$w.parquet"))
      base.resolve(s"wave$w.parquet").toFile
        .setLastModified(1700000000000L + w * 60000L)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(base.toString)
    val q = graft.streaming.EventStream.windowedCounts(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("probe2_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.foreach(p => println(
      s"batch=${p.batchId} rows=${p.numInputRows} eventTime=${p.eventTime}"))
    spark.table("probe2_out").orderBy("event_type", "window_start")
      .collect().foreach(r => println(r.mkString(" | ")))
    spark.stop()
  }
}
