package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (one JSON object per line) source/sink — the de-facto shard
  * format training corpora ship in (`*.jsonl` / `*.jsonl.gz`).
  *
  * Scale rules baked in:
  *  - explicit schema, never inference (schema inference is a full
  *    extra pass over the data — a 100 TB corpus gets scanned twice);
  *  - PERMISSIVE + corrupt-record column: one broken shard line is
  *    quarantined, not a job abort (same discipline as
  *    [[graft.slurm.SacctSource]]);
  *  - plain-line JSONL is splittable; gzip shards are not, so a real
  *    deployment keeps shard files ≈ one task each — which is exactly
  *    how public corpora (C4, RedPajama, FineWeb) are already laid out.
  */
object JsonlSource {

  /** The documents-table schema (TESTDATA.md). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Read JSONL with an explicit schema; malformed lines land in
    * `_corrupt` with every data column null.
    *
    * Parsed as text-source + `from_json` rather than `spark.read.json`:
    * same splittability and codegen'd parse, but the quarantine column
    * is a REAL column — the raw json source forbids plans that
    * reference only its internal corrupt column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is
    * exactly what an audit query does. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val full = schema.add(StructField("_corrupt", StringType))
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), full, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt")).as("j"))
      .select(col("j.*"))
  }

  /** Clean rows only (quarantine dropped, data columns intact). */
  def readClean(spark: SparkSession, path: String, schema: StructType): DataFrame =
    read(spark, path, schema).filter(col("_corrupt").isNull).drop("_corrupt")

  /** The quarantined raw lines (for a side-channel audit sink). */
  def readQuarantine(spark: SparkSession, path: String,
                     schema: StructType): DataFrame =
    read(spark, path, schema).filter(col("_corrupt").isNotNull)
      .select(col("_corrupt").as("raw_line"))

  def readDocuments(spark: SparkSession, path: String): DataFrame =
    readClean(spark, path, documentsSchema)

  /** Write a corpus as JSONL shards (one file per partition — partition
    * count IS the shard layout). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
