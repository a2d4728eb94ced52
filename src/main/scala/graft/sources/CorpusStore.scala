package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Warehouse layout for a curated document corpus — the sink side of
  * the training-data pipeline (the slurm twin is
  * [[graft.slurm.SlurmWarehouse.writeBucketed]]).
  *
  * Layout = the query plan you pre-paid for: partitioning by a
  * low-cardinality slice column (language, source, date) gives
  * partition PRUNING — a per-language training run reads only its
  * directories; bucketing by the doc key gives EXCHANGE-FREE joins and
  * rollups for every doc-keyed operation afterwards (joining quality
  * scores, dedup verdicts, shard assignments back onto the corpus),
  * because both sides already share the bucket distribution. Bucket
  * metadata lives in the session catalog (metastore at cluster scale),
  * hence saveAsTable; the bucket count is the max exchange-free
  * parallelism downstream, so size it to the expected executor count.
  */
object CorpusStore {

  def writeBucketed(docs: DataFrame, table: String,
                    partitionCol: String = "lang",
                    bucketCol: String = "doc_id",
                    nBuckets: Int = 32): Unit =
    docs.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Append a batch into an existing bucketed corpus table — the
    * incremental-curation sink path. The spec must match the table's
    * (Spark refuses a mismatched bucketBy, so a drifted caller fails
    * loudly instead of silently corrupting the layout). Each appended
    * batch adds ≥1 file per touched bucket, which is why this pairs
    * with [[compactBucketed]]. */
  def appendBucketed(docs: DataFrame, table: String,
                     partitionCol: String = "lang",
                     bucketCol: String = "doc_id",
                     nBuckets: Int = 32): Unit =
    docs.write
      .mode(SaveMode.Append)
      .partitionBy(partitionCol)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket-PRESERVING compaction: incremental loads fragment a
    * bucketed table (one file per bucket per appended batch — a year
    * of daily batches is 365 files per bucket, and the bucketed scan's
    * per-bucket sorted-merge pays for every one), and a naive
    * read-and-rewrite compactor would DROP the bucket metadata,
    * silently re-introducing an exchange into every downstream
    * doc-keyed join. This one rewrites through the SAME bucket spec,
    * read from the catalog (never from caller arguments — a re-spec
    * can't sneak in): one `repartition(nBuckets, bucketCol)` pass
    * aligns write tasks with buckets (Spark's bucket id and
    * HashPartitioning use the same murmur3-pmod mapping, which is also
    * why bucketed joins skip the exchange), so each (partition,
    * bucket) lands in exactly one file, re-sorted per the table's
    * sortBy. The rewrite stages into a temp table, then swaps by
    * renaming the live table aside (live → `_precompact`, staged →
    * live, drop `_precompact`) so every crash point leaves a
    * recoverable named table — a metastore can't make two operations
    * one atomic step, so the order is chosen so no window destroys
    * data before the replacement is live (at cluster scale, run
    * off-peak like [[graft.slurm.SlurmWarehouse.compact]]).
    * Returns (filesBefore, filesAfter). */
  def compactBucketed(spark: SparkSession, table: String): (Long, Long) = {
    val id = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val md = spark.sessionState.catalog.getTableMetadata(id)
    val bs = md.bucketSpec.getOrElse(
      sys.error(s"compactBucketed: $table has no bucket spec"))
    val parts = md.partitionColumnNames
    def fileCount(t: String): Long =
      spark.table(t).select(
        org.apache.spark.sql.functions.input_file_name().as("f"))
        .distinct().count()
    val before = fileCount(table)
    val tmp = table + "_compacting"
    // co-locate each whole bucket in one write task: range-partition on
    // the EXPLICIT bucket id (pmod(murmur3, n) — the same mapping the
    // bucketed scan/join uses), so every (partition dir, bucket) pair
    // opens exactly one output file
    val bucketId = org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.hash(bs.bucketColumnNames.map(col): _*),
      org.apache.spark.sql.functions.lit(bs.numBuckets))
    val w0 = spark.table(table)
      .repartitionByRange(bs.numBuckets, bucketId)
      .write.mode(SaveMode.Overwrite)
    val w1 = if (parts.nonEmpty) w0.partitionBy(parts: _*) else w0
    val w2 = w1.bucketBy(bs.numBuckets,
      bs.bucketColumnNames.head, bs.bucketColumnNames.tail: _*)
    val w3 =
      if (bs.sortColumnNames.isEmpty) w2
      else w2.sortBy(bs.sortColumnNames.head, bs.sortColumnNames.tail: _*)
    w3.format("parquet").saveAsTable(tmp)
    // swap via rename-ASIDE, not drop-then-rename: two metastore ops
    // can never be one atomic step, so order them so every failure
    // point leaves a recoverable NAMED table. live → _precompact
    // first (a crash here: recover with ALTER TABLE x_precompact
    // RENAME TO x), then tmp → live (a crash here: same recovery, or
    // finish by renaming _compacting), and only then drop the old
    // data. A reader racing the swap can still observe a brief
    // no-table-at-name window — the operation is documented as
    // off-peak — but no window any longer DESTROYS data before the
    // new table is live.
    val old = table + "_precompact"
    spark.sql(s"ALTER TABLE $table RENAME TO $old")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    // RENAME moves the table directory but leaves PARTITION metadata
    // pointing at the ORIGINAL paths — which the second rename just
    // repopulated with the new data. A plain DROP of the old table
    // would chase those stale locations and delete the fresh files
    // out from under the live name, so drop the old partitions
    // METADATA-ONLY (retainData) first; the table drop then removes
    // only its own (moved) directory — the old data, as intended.
    if (parts.nonEmpty) {
      val cat = spark.sessionState.catalog
      val oldId = spark.sessionState.sqlParser.parseTableIdentifier(old)
      val specs = cat.listPartitions(oldId).map(_.spec)
      if (specs.nonEmpty)
        cat.dropPartitions(oldId, specs, ignoreIfNotExists = true,
          purge = false, retainData = true)
    }
    spark.sql(s"DROP TABLE $old")
    // rename moves the managed location but the catalog's PARTITION
    // entries still reference the old paths — without the repair a
    // partitioned table reads back EMPTY after the swap
    if (parts.nonEmpty) spark.sql(s"MSCK REPAIR TABLE $table")
    (before, fileCount(table))
  }

  /** Z-clustered path write — the third layout lever, for TWO-key
    * RANGE scans (partitioning prunes a slice column, bucketing
    * co-locates joins, z-clustering prunes 2-D range boxes): rows are
    * range-partitioned and sorted on the Morton interleave of (x, y)
    * ([[graft.operators.Layout.clusterByZ]]), so every output file
    * covers a bounded rectangle of the key space and parquet min/max
    * footers prune scans filtered on EITHER key (WarehouseSpec pins
    * disjoint per-file z-runs and rectangle-bounded spans). `files` is
    * the target file count — at 100 TB set it so files land near the
    * rowgroup-friendly 128 MB–1 GB band. */
  def writeZClustered(docs: DataFrame, path: String,
                      x: org.apache.spark.sql.Column,
                      y: org.apache.spark.sql.Column,
                      bits: Int = 31, files: Int = 32): Unit =
    graft.operators.Layout.clusterByZ(docs, x, y, bits, files)
      .write.mode(SaveMode.Overwrite).parquet(path)
}
