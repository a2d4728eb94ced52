package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord codec for the d107 gate — the OTHER canonical
  * training-data container next to WebDataset tar shards (d104):
  * a TFRecord stream is a sequence of
  * `len:u64le · maskedCrc32c(len):u32le · data · maskedCrc32c(data):u32le`
  * records, where the mask is TensorFlow's published rotation
  * `((crc >> 15) | (crc << 17)) + 0xa282ead8` over CRC-32C
  * (Castagnoli — the JDK's `java.util.zip.CRC32C`, an independent
  * implementation of the polynomial core). Both checksums are
  * verified strictly per record; either failing quarantines the
  * shard.
  *
  * Reference anchor: same constructor∘decoder discipline as the
  * d89-d106 gates (SURVEY §2.5) carried to the TFRecord framing.
  */
object TfRecordCodec {

  private val MAX_BYTES = 1L << 30

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** TensorFlow's masked CRC-32C. */
  private[graft] def maskedCrc(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(b, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def w32le(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }

  private[graft] def encode(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(records.map(_.length + 16).sum)
    records.foreach { r =>
      val lenB = new Array[Byte](8)
      var v = r.length.toLong
      var i = 0
      while (i < 8) { lenB(i) = (v & 0xFF).toByte; v >>>= 8; i += 1 }
      out.write(lenB, 0, 8)
      w32le(out, maskedCrc(lenB, 0, 8))
      out.write(r, 0, r.length)
      w32le(out, maskedCrc(r, 0, r.length))
    }
    out.toByteArray
  }

  private def u32le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  /** STRICT decode → records in order, or None. Verifies BOTH masked
    * CRC-32Cs per record, the length bound, and exact stream
    * consumption (trailing garbage quarantines). An empty stream is
    * a valid empty shard. */
  private[graft] def decode(b: Array[Byte]): Option[Seq[Array[Byte]]] = {
    try {
      val out = Seq.newBuilder[Array[Byte]]
      var pos = 0
      var total = 0L
      while (pos < b.length) {
        if (pos + 12 > b.length) throw Malformed
        if (u32le(b, pos + 8) != maskedCrc(b, pos, 8)) throw Malformed
        var len = 0L
        var i = 7
        while (i >= 0) { len = (len << 8) | (b(pos + i) & 0xFFL); i -= 1 }
        total += len
        if (len < 0 || total > MAX_BYTES) throw Malformed
        val dataAt = pos + 12
        val dataEnd = dataAt + len.toInt
        if (dataEnd + 4 > b.length) throw Malformed
        if (u32le(b, dataEnd) != maskedCrc(b, dataAt, len.toInt)) throw Malformed
        out += java.util.Arrays.copyOfRange(b, dataAt, dataEnd)
        pos = dataEnd + 4
      }
      Some(out.result())
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}

/** Deterministic in-plan TFRecord-shard synthesizer + gate for d107 —
  * the d104 discipline on the second canonical training container.
  * Each doc becomes a shard of K records with closed-form content
  * bytes. Damage slice on doc_id % 7: 0 → truncated mid-trailer (the
  * final data-CRC loses bytes — always malformed; a record-boundary
  * cut would be a valid shorter stream, the d106 lesson), 3 → the
  * first record's LENGTH CRC bit-flipped, 5 → the first record's
  * DATA CRC bit-flipped — both integrity fields the format exists
  * to check, exercised independently. */
object TfRecordSim {

  private[graft] def nRecords(docId: Long): Int = (3 + docId % 6).toInt

  private[graft] def recLen(docId: Long, i: Int): Int =
    (8 + (docId * 5 + i * 3) % 29).toInt

  private[graft] def recByte(docId: Long, i: Int, j: Int): Int =
    ((docId * 11 + i * 17 + j) % 256).toInt

  private[graft] def records(docId: Long): Seq[Array[Byte]] =
    (0 until nRecords(docId)).map { i =>
      val r = new Array[Byte](recLen(docId, i))
      var j = 0
      while (j < r.length) { r(j) = recByte(docId, i, j).toByte; j += 1 }
      r
    }

  private[graft] def cleanShard(docId: Long): Array[Byte] =
    TfRecordCodec.encode(records(docId))

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val shard = cleanShard(docId)
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(shard, shard.length - 2)
      case 3 =>
        // length-CRC of record 0 lives at bytes 8..11
        val d = shard.clone(); d(9) = (d(9) ^ 0x10).toByte; d
      case 5 =>
        // data-CRC of record 0 follows its content
        val d = shard.clone()
        val at = 12 + recLen(docId, 0) + 1
        d(at) = (d(at) ^ 0x10).toByte; d
      case _ => shard
    }
  }

  private val payloadSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  /** doc_id → payload. Map-only, id-driven. */
  def payloads(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(payloadSchema)
    docs.select(col("doc_id"))
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        Row(id, payloadFor(id))
      })(enc)
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_records", LongType),
    StructField("data_bytes", LongType),
    StructField("byte_sum", LongType)))

  /** Batched strict TFRecord walk → per-shard stats with quarantine —
    * the d107 gate, same mapPartitions batch contract as the media
    * gates. */
  def stats(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    withPayloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            TfRecordCodec.decode(r.getAs[Array[Byte]](1)) match {
              case Some(rs) =>
                var dataBytes = 0L; var byteSum = 0L
                rs.foreach { rec =>
                  dataBytes += rec.length
                  var j = 0
                  while (j < rec.length) { byteSum += rec(j) & 0xFF; j += 1 }
                }
                Row(id, "ok", rs.length.toLong, dataBytes, byteSum)
              case None =>
                Row(id, "quarantined", null, null, null)
            }
          }
        }
      }(enc)
  }
}
