package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro Object Container File (OCF) codec for the d121 gate — the
  * Hadoop-era corpus shipping format still everywhere in data lakes:
  * a self-describing container (magic `Obj\x01`, an Avro-map file
  * header carrying the writer SCHEMA as JSON plus the codec, a
  * 16-byte SYNC MARKER) of data blocks, each `(record count, byte
  * size, serialized records, sync marker)` — the sync marker is how
  * splits resynchronize, so a MISMATCHED marker is structural
  * corruption and must quarantine. Implemented HERE from the
  * published Avro 1.x spec in BOTH directions: zigzag-varint longs,
  * length-prefixed UTF-8 strings, schema-ordered record fields, the
  * terminated-block map encoding of the header, and both `null` and
  * `deflate` block codecs (raw DEFLATE via the JDK — the d98/zip
  * precedent: the entropy primitive is borrowed, the container codec
  * is ours). The independent interop twin is the REAL Avro library
  * on the public Spark classpath (`org.apache.avro` 1.12):
  * `DataFileWriter`-written files (both codecs) decode in our walker
  * and `DataFileStream` reads our encoder's output record-for-record,
  * spec-pinned both ways.
  *
  * Scope (the d98 discipline): single writer schema — the gate's
  * `doc` record (id: long, text: string), compared canonically;
  * metadata keys `avro.schema` (required) and `avro.codec`
  * (null/deflate); anything else — unknown metadata, other codecs,
  * sync mismatches, count/size lies, trailing bytes — QUARANTINES
  * rather than crashes.
  */
object AvroOcfCodec {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private[graft] val SCHEMA_JSON =
    """{"type":"record","name":"doc","fields":[{"name":"id","type":"long"},{"name":"text","type":"string"}]}"""

  private val MAX_BYTES = 1L << 28

  // ---- avro binary primitives ----------------------------------------

  private final class Reader(b: Array[Byte], var p: Int, val end: Int) {
    def hasMore: Boolean = p < end
    def zlong(): Long = {
      var v = 0L
      var shift = 0
      var i = 0
      while (i < 10) {
        if (p >= end) throw Malformed
        val byte = b(p); p += 1
        v |= (byte & 0x7FL) << shift
        if ((byte & 0x80) == 0) return (v >>> 1) ^ -(v & 1) // zigzag
        shift += 7
        i += 1
      }
      throw Malformed
    }
    def bytesOut(): Array[Byte] = {
      val len = zlong()
      if (len < 0 || len > MAX_BYTES || p + len > end) throw Malformed
      val out = java.util.Arrays.copyOfRange(b, p, p + len.toInt)
      p += len.toInt
      out
    }
    def raw(n: Int): Array[Byte] = {
      if (n < 0 || p + n > end) throw Malformed
      val out = java.util.Arrays.copyOfRange(b, p, p + n)
      p += n
      out
    }
  }

  private final class Writer {
    val out = new java.io.ByteArrayOutputStream()
    def zlong(v0: Long): Unit = {
      var v = (v0 << 1) ^ (v0 >> 63) // zigzag
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def bytes(b: Array[Byte]): Unit = { zlong(b.length.toLong); out.write(b, 0, b.length) }
    def str(s: String): Unit = bytes(s.getBytes("UTF-8"))
  }

  private def deflateRaw(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream(b.length / 2 + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflateRaw(b: Array[Byte], maxOut: Long): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(b)
    val out = new java.io.ByteArrayOutputStream(math.min(maxOut, 1 << 16).toInt)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0 && !inf.finished()) throw Malformed // truncated stream
        out.write(buf, 0, k)
        if (out.size() > maxOut) throw Malformed
      }
      if (inf.getRemaining != 0) throw Malformed
    } catch {
      case _: java.util.zip.DataFormatException => throw Malformed
    } finally inf.end()
    out.toByteArray
  }

  // ---- encode ----------------------------------------------------------

  /** Encode records as a conformant OCF: header (schema + codec) with
    * the given sync marker, blocks of `perBlock` records. */
  private[graft] def encode(records: Seq[(Long, String)], sync: Array[Byte],
                            deflate: Boolean, perBlock: Int): Array[Byte] = {
    require(sync.length == 16)
    val w = new Writer
    w.out.write(Array[Byte]('O', 'b', 'j', 1), 0, 4)
    w.zlong(2L) // metadata map: one block of 2 entries
    w.str("avro.schema"); w.str(SCHEMA_JSON)
    w.str("avro.codec"); w.str(if (deflate) "deflate" else "null")
    w.zlong(0L) // map terminator
    w.out.write(sync, 0, 16)
    records.grouped(math.max(perBlock, 1)).foreach { group =>
      val body = new Writer
      group.foreach { case (id, text) => body.zlong(id); body.str(text) }
      val payload = if (deflate) deflateRaw(body.out.toByteArray)
                    else body.out.toByteArray
      w.zlong(group.length.toLong)
      w.zlong(payload.length.toLong)
      w.out.write(payload, 0, payload.length)
      w.out.write(sync, 0, 16)
    }
    w.out.toByteArray
  }

  // ---- generic container surfaces (d146: Iceberg manifests ride OCF
  // with their own schemas; the container grammar is shared) ------------

  /** Encode pre-serialized record bodies as OCF blocks under an
    * arbitrary writer schema. */
  private[graft] def encodeGeneric(schemaJson: String,
      blocks: Seq[(Int, Array[Byte])], sync: Array[Byte],
      deflate: Boolean): Array[Byte] = {
    require(sync.length == 16)
    val w = new Writer
    w.out.write(Array[Byte]('O', 'b', 'j', 1), 0, 4)
    w.zlong(2L)
    w.str("avro.schema"); w.str(schemaJson)
    w.str("avro.codec"); w.str(if (deflate) "deflate" else "null")
    w.zlong(0L)
    w.out.write(sync, 0, 16)
    blocks.foreach { case (count, body) =>
      val payload = if (deflate) deflateRaw(body) else body
      w.zlong(count.toLong)
      w.zlong(payload.length.toLong)
      w.out.write(payload, 0, payload.length)
      w.out.write(sync, 0, 16)
    }
    w.out.toByteArray
  }

  /** Strict container walk under an arbitrary expected schema →
    * (count, inflated payload) per block. The CALLER must parse each
    * payload into exactly `count` records consuming every byte — the
    * count-lies strictness moves with the schema. */
  private[graft] def decodeGeneric(b: Array[Byte], schemaJson: String)
      : Option[Seq[(Long, Array[Byte])]] =
    try {
      if (b.length < 20 || b(0) != 'O' || b(1) != 'b' || b(2) != 'j' || b(3) != 1)
        return None
      val r = new Reader(b, 4, b.length)
      var schema: String = null
      var codec: String = null
      var mapCount = r.zlong()
      while (mapCount != 0) {
        val n = if (mapCount < 0) { r.zlong(); -mapCount } else mapCount
        var i = 0L
        while (i < n) {
          val key = new String(r.bytesOut(), "UTF-8")
          val value = r.bytesOut()
          key match {
            case "avro.schema" =>
              if (schema != null) throw Malformed
              schema = new String(value, "UTF-8")
            case "avro.codec" =>
              if (codec != null) throw Malformed
              codec = new String(value, "UTF-8")
            case _ => throw Malformed
          }
          i += 1
        }
        mapCount = r.zlong()
      }
      if (schema == null || canon(schema) != canon(schemaJson)) throw Malformed
      val deflate = codec match {
        case null | "null" => false
        case "deflate" => true
        case _ => throw Malformed
      }
      val sync = r.raw(16)
      val out = Seq.newBuilder[(Long, Array[Byte])]
      var total = 0L
      while (r.hasMore) {
        val count = r.zlong()
        if (count <= 0) throw Malformed
        val size = r.zlong()
        if (size < 0 || size > MAX_BYTES) throw Malformed
        val payload = r.raw(size.toInt)
        val body = if (deflate) inflateRaw(payload, MAX_BYTES) else payload
        total += count
        if (total > (1L << 24)) throw Malformed
        if (!java.util.Arrays.equals(r.raw(16), sync)) throw Malformed
        out += ((count, body))
      }
      Some(out.result())
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** Record-body reader for generic schemas (d146). */
  private[graft] def reader(b: Array[Byte]): AvroReader = new AvroReader(b)

  final class AvroReader(b: Array[Byte]) {
    private val r = new Reader(b, 0, b.length)
    def hasMore: Boolean = r.hasMore
    def long(): Long = r.zlong()
    def int(): Int = {
      val v = r.zlong()
      if (v < Int.MinValue || v > Int.MaxValue) throw Malformed
      v.toInt
    }
    def string(): String = {
      val v = r.bytesOut()
      CharsetSniff.decodeUtf8(v, 0, v.length)
    }
    def fail(): Nothing = throw Malformed
  }

  /** Record-body writer for generic schemas (d146). */
  private[graft] def writer(): AvroWriter = new AvroWriter

  final class AvroWriter {
    private val w = new Writer
    def long(v: Long): AvroWriter = { w.zlong(v); this }
    def int(v: Int): AvroWriter = { w.zlong(v.toLong); this }
    def string(s: String): AvroWriter = { w.str(s); this }
    def bytes: Array[Byte] = w.out.toByteArray
  }

  // ---- decode ----------------------------------------------------------

  private def canon(s: String): String = s.replaceAll("\\s+", "")

  /** STRICT decode → (records, blockCount), or None for anything
    * malformed or out of scope. */
  private[graft] def decode(b: Array[Byte]): Option[(Seq[(Long, String)], Int)] =
    try {
      if (b.length < 20 || b(0) != 'O' || b(1) != 'b' || b(2) != 'j' || b(3) != 1)
        return None
      val r = new Reader(b, 4, b.length)
      // file metadata: terminated map blocks
      var schema: String = null
      var codec: String = null
      var mapCount = r.zlong()
      while (mapCount != 0) {
        val n = if (mapCount < 0) { r.zlong(); -mapCount } else mapCount
        var i = 0L
        while (i < n) {
          val key = new String(r.bytesOut(), "UTF-8")
          val value = r.bytesOut()
          key match {
            case "avro.schema" =>
              if (schema != null) throw Malformed
              schema = new String(value, "UTF-8")
            case "avro.codec" =>
              if (codec != null) throw Malformed
              codec = new String(value, "UTF-8")
            case _ => throw Malformed // out-of-scope metadata
          }
          i += 1
        }
        mapCount = r.zlong()
      }
      if (schema == null || canon(schema) != canon(SCHEMA_JSON)) throw Malformed
      val deflate = codec match {
        case null | "null" => false
        case "deflate" => true
        case _ => throw Malformed // other codecs out of scope
      }
      val sync = r.raw(16)
      val recs = Seq.newBuilder[(Long, String)]
      var blocks = 0
      var total = 0L
      while (r.hasMore) {
        val count = r.zlong()
        if (count <= 0) throw Malformed
        val size = r.zlong()
        if (size < 0 || size > MAX_BYTES) throw Malformed
        val payload = r.raw(size.toInt)
        val body = if (deflate) inflateRaw(payload, MAX_BYTES) else payload
        val br = new Reader(body, 0, body.length)
        var i = 0L
        while (i < count) {
          val id = br.zlong()
          val text = new String(br.bytesOut(), "UTF-8")
          recs += ((id, text))
          i += 1
        }
        if (br.hasMore) throw Malformed // count lies about the block
        total += count
        if (total > (1L << 24)) throw Malformed
        if (!java.util.Arrays.equals(r.raw(16), sync)) throw Malformed
        blocks += 1
      }
      Some((recs.result(), blocks))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
}

/** d121 gate — the corpus's REAL text through the Avro container:
  * each doc becomes an OCF of K = 2 + doc_id%5 `doc` records (ids
  * doc_id*1000+i, texts the d113 codepoint slices), 2 records per
  * block (block count replayable as ceil(K/2)), codec alternating
  * null / DEFLATE on doc_id%3==1, sync marker derived
  * deterministically from doc_id. Damage slice on doc_id%7: 0 →
  * truncated mid final sync, 3 → magic stomped, 5 → one byte of the
  * LAST block's sync marker flipped — the split-resynchronization
  * feature the container exists for. */
object AvroOcfSim {

  private[graft] def nRecords(docId: Long): Int = (2 + docId % 5).toInt

  private[graft] def useDeflate(docId: Long): Boolean = docId % 3 == 1

  private[graft] def syncFor(docId: Long): Array[Byte] =
    Array.tabulate[Byte](16)(i => ((docId * 31 + i * 17 + 5) % 256).toByte)

  private[graft] def recordsFor(docId: Long, text: String): Seq[(Long, String)] = {
    val k = nRecords(docId)
    val cps = text.codePointCount(0, text.length)
    (0 until k).map { i =>
      val a = text.offsetByCodePoints(0, (i.toLong * cps / k).toInt)
      val b = text.offsetByCodePoints(0, ((i + 1).toLong * cps / k).toInt)
      (docId * 1000 + i, text.substring(a, b))
    }
  }

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val clean = AvroOcfCodec.encode(recordsFor(docId, text), syncFor(docId),
      useDeflate(docId), perBlock = 2)
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(clean, clean.length - 9)
      case 3 => val d = clean.clone(); d(0) = 'X'; d
      case 5 =>
        val d = clean.clone()
        d(d.length - 7) = (d(d.length - 7) ^ 0x20).toByte // last sync marker
        d
      case _ => clean
    }
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_blocks", LongType),
    StructField("n_records", LongType),
    StructField("sum_ids", LongType),
    StructField("text_bytes", LongType),
    StructField("roundtrip_ok", BooleanType)))

  /** Batched strict container walk → per-doc stats with quarantine —
    * the d121 gate, same mapPartitions batch contract as the other
    * container gates (map-only). */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            AvroOcfCodec.decode(payloadFor(id, text)) match {
              case Some((recs, blocks)) =>
                val sumIds = recs.map(_._1).sum
                val textBytes = recs.map(_._2.getBytes("UTF-8").length.toLong).sum
                Row(id, "ok", blocks.toLong, recs.length.toLong, sumIds,
                  textBytes, java.lang.Boolean.valueOf(
                    recs.map(_._2).mkString == text))
              case None =>
                Row(id, "quarantined", null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
