package graft.slurm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for sacct output dumps (the reference shells out to sacct and
  * iterates rows one-by-one, slurm2sql.py:854-914; graft reads the same
  * bytes as a splittable file source so a 100 TB accounting dump scans
  * in parallel with the schema applied at the scan).
  *
  * Malformed rows: PERMISSIVE mode + a corrupt-record column, instead of
  * the reference's line-continuation heuristic for embedded newlines in
  * job names (slurm2sql.py:888-905) — at scale a malformed-row quarantine
  * beats silent line gluing.
  */
object SacctSource {

  /** `sacct -P --delimiter=';|;'` output (multi-char separator). */
  def readSacct(spark: SparkSession, path: String): DataFrame =
    readDelimited(spark, path, ";|;")

  /** CSV input (`--csv-input`), e.g. the reference's tests/test-data3.csv. */
  def readCsv(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    readDelimited(spark, path, sep)

  def readDelimited(spark: SparkSession, path: String, sep: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("quote", "\u0000")          // sacct does not quote
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** Full pipeline: raw sacct/CSV file → typed slurm table. */
  def loadSlurmTable(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    SlurmTable.build(readDelimited(spark, path, sep))
}
