package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables

/** Measures the flatMapGroupsWithState event-time-timeout protocol and
  * the stream-stream interval-join protocol BEFORE the d169/d170
  * oracles are written (the d165 lesson: the late-filter watermark in
  * batch b reflects batch b-2's stats — one batch later than the
  * reported value; assume nothing, measure everything).
  *
  * Session probe questions:
  *  (a) does a late row (ts << watermark) still reach the state
  *      machine in a later batch, or is it filtered first?
  *  (b) in WHICH batch does an expired event-time timeout fire — i.e.
  *      which batch's stats feed the firing watermark?
  *  (c) does AvailableNow run trailing no-data batches that advance
  *      the watermark and fire the remaining timeouts, and what is
  *      the final watermark?
  *
  * Correlate probe questions:
  *  (d) same-batch and cross-batch pairs within the band emit?
  *  (e) is a late row on one side filtered before it can join state
  *      from the other side (and with which batch's watermark)?
  *
  * Wave layout (hours after 2024-01-01T00:00:00Z, horizon 30 min,
  * gap 30 min):
  *   wave0: u1@01:00  u2@02:00  u9@10:00   (u9 sets the max)
  *   wave1: u3@03:00  u9@10:20
  *   wave2: u1@01:30  u4@09:45  u9@10:40
  * Hypothesis table (late filter present + stats lag L):
  *   L=1 (batch b filters on batch b-1 stats): u2/u3 timeouts fire in
  *     batch 1/2; u1's 01:30 dropped in batch 2 (wm 09:30 or 09:50).
  *   L=2 (b-2 stats, the d165 class): batch 1 has wm -inf (u1's
  *     timeout cannot fire before batch 2), u1's 01:30 dropped iff
  *     batch-2 wm is 09:30 (= wave0 max - 30 min).
  */
object StreamProbe3 {
  private def stage(rows: Seq[(Long, java.time.Instant, Double)],
                    base: java.nio.file.Path, wave: Int,
                    spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val tmp = base.resolve(s"_w$wave").toString
    rows.map { case (u, t, v) =>
      (u, new java.sql.Timestamp(t.toEpochMilli), v)
    }.toDF("user_id", "ts", "value")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, base.resolve(f"wave$wave.parquet"))
    base.resolve(f"wave$wave.parquet").toFile
      .setLastModified(1700000000000L + wave * 60000L)
  }

  private def at(h: Double): java.time.Instant =
    java.time.Instant.parse("2024-01-01T00:00:00Z")
      .plusSeconds((h * 3600L).toLong)

  def main(args: Array[String]): Unit = {
    val spark = Tables.session("stream-probe3", "4")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))

    // ---------- session probe ----------
    val base = java.nio.file.Files.createTempDirectory("probe_sess")
    // u5@09:35 is THE lag discriminator: wave-2 arrival between the
    // b-2 watermark (09:30 = wave0 max − 30 min) and the b-1 one
    // (09:50) — kept iff the late filter uses b-2 stats; its timeout
    // (10:05) is under the final watermark (10:10), so kept ⇒ emitted.
    // u6 probes the negative-gap merge: wave-1 arrival 10 min BEFORE
    // its wave-0 predecessor merges (n=2) instead of splitting.
    stage(Seq((1L, at(1.0), 1.0), (2L, at(2.0), 2.0), (6L, at(5.0), 6.0),
      (9L, at(10.0), 9.0)), base, 0, spark)
    stage(Seq((3L, at(3.0), 3.0), (6L, at(5.0 - 10.0 / 60), 6.1),
      (9L, at(10.0 + 20.0 / 60), 9.1)), base, 1, spark)
    stage(Seq((1L, at(1.5), 1.1), (4L, at(9.75), 4.0),
      (5L, at(9.0 + 35.0 / 60), 5.0), (9L, at(10.0 + 40.0 / 60), 9.2)), base, 2, spark)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(base.toString)
    val out = graft.streaming.EventStream.sessionize(spark, stream)
    val q = out.writeStream.outputMode("append")
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) => {
        val rows = df.collect().map(_.mkString(",")).sorted.mkString(" ; ")
        println(s"[sess] batch=$id out=[$rows]")
      })
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.foreach(p => println(
      s"[sess] progress batch=${p.batchId} rows=${p.numInputRows} eventTime=${p.eventTime}"))

    // ---------- correlate probe ----------
    val lbase = java.nio.file.Files.createTempDirectory("probe_corr_l")
    val rbase = java.nio.file.Files.createTempDirectory("probe_corr_r")
    // left wave0: L1(u1@01:00) L9(u9@10:00); wave1: L2(u2@09:40); wave2: (u9@10:40)
    stage(Seq((1L, at(1.0), 10.0), (9L, at(10.0), 90.0)), lbase, 0, spark)
    stage(Seq((2L, at(9.0 + 40.0 / 60), 20.0)), lbase, 1, spark)
    stage(Seq((9L, at(10.0 + 40.0 / 60), 91.0)), lbase, 2, spark)
    // right wave0: R1(u1@01:02); wave1: R2(u2@09:42) R1b(u1@01:04); wave2: R1c(u1@01:03)
    stage(Seq((1L, at(1.0 + 2.0 / 60), 100.0)), rbase, 0, spark)
    stage(Seq((2L, at(9.0 + 42.0 / 60), 200.0), (1L, at(1.0 + 4.0 / 60), 101.0)), rbase, 1, spark)
    stage(Seq((1L, at(1.0 + 3.0 / 60), 102.0)), rbase, 2, spark)

    val ls = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(lbase.toString)
    val rs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(rbase.toString)
    val joined = graft.streaming.EventStream.correlate(ls, rs, toleranceS = 300)
    val q2 = joined.writeStream.outputMode("append")
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) => {
        val rows = df.collect().map(_.mkString(",")).sorted.mkString(" ; ")
        println(s"[corr] batch=$id out=[$rows]")
      })
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    q2.recentProgress.foreach(p => println(
      s"[corr] progress batch=${p.batchId} rows=${p.numInputRows} eventTime=${p.eventTime}"))
    spark.stop()
  }
}
