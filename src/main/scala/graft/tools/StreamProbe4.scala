package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables

/** Measures dropDuplicatesWithinWatermark's protocol before the d176
  * oracle is written (the d165/StreamProbe3 discipline):
  *  (a) which batch's stats feed the LATE filter (b-2 expected);
  *  (b) is a duplicate SUPPRESSED by state whose expiry has passed
  *      but whose eviction has not happened yet (lookup-expiry vs
  *      eviction-only), and which watermark evicts;
  *  (c) does an evicted key RE-EMIT on its next arrival;
  *  (d) which ts is stored when twins share a batch.
  *
  * Waves (hours after 2024-01-01, horizon 30 min):
  *   wave0: A@01:00  M@10:00(max)         — A's state expires 01:30
  *   wave1: A@01:10  B@02:00  M@10:20     — dup within expiry? state
  *          still live (no eviction yet, wm_evict(1)=09:30>01:30 —
  *          evicted BEFORE or AFTER the batch-1 lookup? measured)
  *   wave2: A@09:40  B@02:05  M@10:40     — A again (if evicted by
  *          now → re-emit); B dup at 02:05 vs wm_late(2)=09:30 → LATE
  *          → dropped regardless
  */
object StreamProbe4 {
  def main(args: Array[String]): Unit = {
    val spark = Tables.session("stream-probe4", "4")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("probe_dedup")
    def at(h: Double): java.sql.Timestamp = new java.sql.Timestamp(
      java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds((h * 3600L).toLong).toEpochMilli)
    def stage(rows: Seq[(Long, java.sql.Timestamp, String)], w: Int): Unit = {
      val tmp = base.resolve(s"_w$w").toString
      rows.toDF("doc_id", "ts", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, base.resolve(s"wave$w.parquet"))
      base.resolve(s"wave$w.parquet").toFile
        .setLastModified(1700000000000L + w * 60000L)
    }
    // D probes the REFRESH question: D@08:30 (wave1) is suppressed —
    // if a suppressed dup refreshes expiry, D@09:05 (wave2) is still
    // suppressed (expiry 09:30 > wm_late(2)=09:00); if not, D's state
    // (expiry 02:00) is gone and 09:05 re-emits.
    // C@09:10 (wave2, fresh hash) is the late-filter discriminator:
    // kept iff the filter uses b-2 stats (09:00), dropped iff b-1
    // (09:20).
    stage(Seq((1L, at(1.0), "A"), (6L, at(1.0), "D"), (9L, at(10.0), "M")), 0)
    stage(Seq((2L, at(1.0 + 10.0 / 60), "A"), (3L, at(2.0), "B"),
      (7L, at(8.5), "D"), (9L, at(10.0 + 20.0 / 60), "M2")), 1)
    stage(Seq((4L, at(9.0 + 40.0 / 60), "A"), (5L, at(2.0 + 5.0 / 60), "B"),
      (8L, at(9.0 + 5.0 / 60), "D"), (10L, at(9.0 + 10.0 / 60), "C"),
      (9L, at(10.0 + 40.0 / 60), "M3")), 2)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(base.toString)
    val out = graft.streaming.EventStream.deduplicated(stream, col("text"))
    val q = out.writeStream.outputMode("append")
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) => {
        val rows = df.select("doc_id", "ts", "text").collect()
          .map(_.mkString(",")).sorted.mkString(" ; ")
        println(s"[dedup] batch=$id out=[$rows]")
      })
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.foreach(p => println(
      s"[dedup] progress batch=${p.batchId} rows=${p.numInputRows} eventTime=${p.eventTime}"))
    spark.stop()
  }
}
