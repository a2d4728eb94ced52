package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

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
