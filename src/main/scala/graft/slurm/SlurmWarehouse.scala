package graft.slurm

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's output artifact is a SQLite file with indexes on
  * (JobIDnostep, Start, User+Start, Time, User+Time)
  * (slurm2sql.py:867-874) plus a `meta_slurm_lastupdate` bookmark
  * (slurm2sql.py:1104-1120). The Spark-native equivalent is a LAYOUT,
  * not an index: parquet partitioned by day-of-Time (partition pruning
  * replaces the Time index), sorted within partitions by (User, Start)
  * (min/max page stats replace the composite indexes), with the
  * bookmark as a one-row parquet.
  *
  * At 100 TB this is the difference between a full scan and pruning to
  * the queried days; writes stay append-only per day so incremental
  * (history-resume) loads never rewrite old partitions.
  */
object SlurmWarehouse {

  /** Write/append the slurm table to the warehouse layout. */
  def write(slurm: DataFrame, path: String,
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    slurm
      .withColumn("time_day", date_format(
        timestamp_seconds(coalesce(col("Time"), col("Submit"))), "yyyy-MM-dd"))
      .repartition(col("time_day"))
      .sortWithinPartitions(col("User"), col("Start"))
      .write
      .partitionBy("time_day")
      .mode(mode)
      .parquet(s"$path/slurm")
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/slurm")

  /** Persist the resume bookmark (meta_slurm_lastupdate). */
  def updateLastTimestamp(spark: SparkSession, path: String, ts: Long): Unit = {
    import spark.implicits._
    Seq(ts).toDF("update_time").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/meta_lastupdate")
  }

  /** Read the resume bookmark; None if never written. */
  def lastTimestamp(spark: SparkSession, path: String): Option[Long] =
    try Some(spark.read.parquet(s"$path/meta_lastupdate")
      .agg(max(col("update_time"))).collect()(0).getLong(0))
    catch { case _: Exception => None }

  /** Incremental load: append rows newer than the bookmark, then move
    * the bookmark — the Spark form of `--history-resume`. */
  def resumeAppend(spark: SparkSession, newRows: DataFrame, path: String): Long = {
    val since = lastTimestamp(spark, path).getOrElse(Long.MinValue)
    val fresh = newRows.filter(coalesce(col("Time"), col("Submit")) > since)
    write(fresh, path, SaveMode.Append)
    val newMax = fresh.agg(max(coalesce(col("Time"), col("Submit"))))
      .collect()(0)
    val ts = if (newMax.isNullAt(0)) since else newMax.getLong(0)
    if (ts != Long.MinValue) updateLastTimestamp(spark, path, ts)
    ts
  }
}
