package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.5 #51): image/audio/video as
  * opaque `binary` payloads + typed metadata, with a batched decode /
  * feature-extract stage.
  *
  * The decode itself is STUBBED (no image/audio libs in this container):
  * `fakeDecode` produces a deterministic feature from the bytes. The
  * Spark-side plumbing is real — binary column, metadata struct, and a
  * mapPartitions stage that drains the iterator in fixed-size batches
  * exactly the way an Arrow/pandas-UDF batch decode would on a cluster
  * (batch shape: Array[Array[Byte]] of ≤ batchSize payloads).
  */
object Multimodal {

  val BATCH_SIZE = 32

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** Attach a fake binary payload + typed metadata to documents (the
    * driver corpus has no real media; payload = utf8 bytes of text). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        (lit(100) + col("n_chars") % 540).cast("int").as("width"),
        (lit(100) + (col("n_chars") * 7) % 380).cast("int").as("height"),
        element_at(array(lit("png"), lit("jpeg"), lit("webp")),
          (col("doc_id") % 3 + 1).cast("int")).as("format")).as("meta"))

  /** STUB decoder: deterministic 4-float feature from payload bytes.
    * A real deployment swaps this body for the image/audio decode; the
    * signature (one batch of payloads in, one feature array per payload
    * out) is the contract a GPU/native decoder needs. */
  def fakeDecode(batch: Array[Array[Byte]]): Array[Array[Float]] =
    batch.map { bytes =>
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      Array((h & 0xFFFF).toFloat, ((h >> 16) & 0xFFFF).toFloat,
        ((h >> 32) & 0xFFFF).toFloat, bytes.length.toFloat)
    }

  /** Frame sampling over an opaque payload: fixed-size frames at a
    * keep-every-Nth stride — the video-frame-sample shape (a real
    * deployment points frameBytes at the container's frame table or a
    * fixed-rate codec; the windowing/stride/explode plumbing is what
    * Spark owns either way). Pure Catalyst expressions — map-only,
    * codegen'd, scan-speed at any corpus size; one output row per kept
    * frame, frame identity = md5 (verifiable in any engine).
    *
    * Slices the BINARY column directly (`substring`/`length`/`md5` all
    * operate byte-wise on BinaryType), so frames are byte-accurate for
    * arbitrary non-UTF-8 payloads. The DuckDB oracle replays it over
    * the text column (its 1.0 BLOB type has no substring/md5), which is
    * equivalent only because the gate corpus is pure ASCII — verified:
    * octet_length(encode(text)) == length(text) for every row. */
  def sampleFrames(withPayloads: DataFrame, frameBytes: Int = 256,
                   everyN: Int = 2): DataFrame = {
    val nFrames = ceil(length(col("_b")).cast("double") / frameBytes).cast("long")
    val frame = col("_b").substr((col("frame_idx") * frameBytes + 1).cast("int"),
      lit(frameBytes))
    withPayloads
      .select(col("doc_id"), col("payload").as("_b"))
      // empty payload → no frames (DuckDB's generate_series(0,-1,2) is
      // empty; Spark's sequence would throw on the reversed bounds)
      .where(length(col("_b")) > 0)
      .select(col("doc_id"), col("_b"),
        explode(sequence(lit(0L), nFrames - 1, lit(everyN.toLong))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        length(frame).cast("long").as("frame_len"),
        md5(frame).as("frame_hash"))
  }

  /** Batched decode stage: mapPartitions drains rows in BATCH_SIZE
    * groups — the Scala analog of `mapInPandas` batch decode. */
  def decodeFeatures(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    withPayloads.select(col("doc_id"), col("payload"),
      col("meta.width"), col("meta.height"), col("meta.format"))
      .mapPartitions { rows =>
        rows.grouped(BATCH_SIZE).flatMap { chunk =>
          val payloads = chunk.map(_.getAs[Array[Byte]]("payload")).toArray
          val feats = fakeDecode(payloads)
          chunk.iterator.zipWithIndex.map { case (r, i) =>
            Row(r.getAs[Long]("doc_id"), r.getAs[Int]("width"),
              r.getAs[Int]("height"), r.getAs[String]("format"),
              payloads(i).length.toLong, feats(i))
          }
        }
      }(enc)
  }
}
