package graft.slurm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Readers for sacct output dumps (the reference shells out to sacct and
  * iterates rows one-by-one, slurm2sql.py:854-914; graft reads the same
  * bytes as a splittable file source so a 100 TB accounting dump scans
  * in parallel with the schema applied at the scan).
  *
  * Two malformed-row strategies:
  *  - default: PERMISSIVE mode + a corrupt-record column — a quarantine,
  *    splittable at any size;
  *  - [[readReassembled]]: the reference's line-continuation semantics
  *    (slurm2sql.py:888-905) — JobName can contain embedded newlines(!),
  *    so under-length lines are glued to their successors until the
  *    field count is reached. Record membership is a prefix-sum of
  *    separator counts, so gluing is a window + group, not a sequential
  *    driver loop.
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

  /** Reference line-continuation semantics: a record whose JobName
    * embeds newlines spans several physical lines; every complete
    * record carries exactly (ncols − 1) separators, so the record index
    * of a physical line is
    * `floor(separators-on-earlier-lines / (ncols − 1))` — a running sum,
    * then group-and-glue. Runs per input file (records never span
    * files; a 100 TB dump is many day-batch files, each file's line
    * chain is one window partition — same sequential contract as the
    * reference, parallel across files). */
  def readReassembled(spark: SparkSession, path: String,
                      sep: String = ";|;"): DataFrame = {
    val sepRe = java.util.regex.Pattern.quote(sep)
    val lines = spark.read.text(path)
      .select(col("value"), input_file_name().as("_file"),
        monotonically_increasing_id().as("_lid"))
    // header: first line of each file (monotonic id follows file order)
    val firstLid = lines.groupBy(col("_file")).agg(min(col("_lid")).as("_hlid"))
    val colNames = lines.join(firstLid, Seq("_file"))
      .filter(col("_lid") === col("_hlid"))
      .select(col("value")).head().getString(0).split(sepRe, -1).toSeq
    val nSep = colNames.length - 1
    val body = lines.join(firstLid, Seq("_file"))
      .filter(col("_lid") > col("_hlid"))
      .withColumn("_nsep", (size(split(col("value"), sepRe, -1)) - 1).cast("long"))
    val wCum = Window.partitionBy(col("_file")).orderBy(col("_lid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val grouped = body
      .withColumn("_rec", coalesce(floor(sum(col("_nsep")).over(wCum) / nSep), lit(0L)))
      .groupBy(col("_file"), col("_rec"))
      .agg(
        array_join(transform(sort_array(collect_list(
          struct(col("_lid"), col("value")))), x => x("value")), "\n").as("_glued"),
        sum(col("_nsep")).as("_totsep"))
    // quarantine records that never reached the field count (trailing
    // fragment) or overflowed it (the reference logs + skips those too,
    // slurm2sql.py:906-911)
    val complete = grouped.filter(col("_totsep") === nSep)
    val fields = split(col("_glued"), sepRe, -1)
    // empty field → NULL, matching the CSV reader's unquoted-empty rule
    complete.select(colNames.zipWithIndex.map { case (n, i) =>
      nullif(fields.getItem(i), lit("")).as(n)
    }: _*)
  }

  /** Full pipeline: raw sacct/CSV file → typed slurm table. */
  def loadSlurmTable(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    SlurmTable.build(readDelimited(spark, path, sep))
}
