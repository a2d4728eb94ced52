package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.slurm.SlurmTable

/** Streaming twin of the batch sacct ingest (SURVEY §2.6): the
  * reference's deployment loop is cron + `--history-resume`
  * (slurm2sql.py:791-851) — re-run, read what's new, append. Here a
  * file source watches a drop directory for new sacct dumps; the file
  * source's checkpoint tracks which files were already processed, so
  * each dump is ingested exactly once (the streaming form of the
  * `meta_slurm_lastupdate` bookmark), and every micro-batch runs the
  * SAME `SlurmTable.build` derivations as the batch path — one parser,
  * two execution modes.
  *
  * At scale: each micro-batch is a parallel scan of the new files
  * (map-only parse, no shuffle before the partitioned sink), and the
  * day-partitioned parquet sink matches [[graft.slurm.SlurmWarehouse]]'s
  * layout, so all downstream views/reports read either output
  * identically.
  */
object SlurmStream {

  /** Unbounded slurm table from a drop directory of sacct dumps.
    * Streaming file sources cannot infer schemas, so the caller passes
    * the dump header schema (all-string; e.g. from a batch peek at one
    * existing file). */
  def ingest(spark: SparkSession, inDir: String, schema: StructType,
             sep: String = ",", now: Column = lit(0L)): DataFrame = {
    val raw = spark.readStream
      .schema(schema)
      .option("header", "true")
      .option("sep", sep)
      .option("quote", "\u0000")          // sacct does not quote
      .option("mode", "PERMISSIVE")
      .csv(inDir)
    SlurmTable.build(raw, now)
  }

  /** Sink to the warehouse layout (day-partitioned parquet, same as
    * `SlurmWarehouse.write`). AvailableNow processes everything present
    * then stops — the cron-replacement shape: each scheduled run drains
    * new dumps and exits; a long-lived `Trigger.ProcessingTime` works
    * unchanged. */
  def toWarehouse(slurm: DataFrame, path: String,
                  checkpoint: String): StreamingQuery =
    slurm
      .withColumn("time_day", date_format(
        timestamp_seconds(coalesce(col("Time"), col("Submit"))), "yyyy-MM-dd"))
      .writeStream
      .format("parquet")
      .partitionBy("time_day")
      .option("path", s"$path/slurm")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}
