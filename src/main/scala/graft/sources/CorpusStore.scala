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
}
