package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** G.711 μ-law codec for the d103 gate — the compressed-AUDIO sibling
  * of the d98/d101/d102 image codecs (d93's WAV path is uncompressed
  * 16-bit PCM; real telephony/call-center corpora ship companded
  * 8-bit μ-law, WAVE format tag 7). μ-law is lossy but each sample
  * decodes by a pure integer closed form — sign/exponent/mantissa
  * unpacking of the complemented code byte:
  *
  *   mag = ((mant·8 + 0x84) << exp) − 0x84
  *
  * — so unlike JPEG the ORACLE replays the full decode arithmetic
  * per sample in SQL: exact sums through a genuinely lossy codec
  * with no closed-form restrictions on the content.
  *
  * Reference anchor: same constructor∘decoder pattern as the
  * d89/d93/d98 gates (SURVEY §2.5); the independent decoder pinned in
  * MediaDecodePropertySpec is the JDK's own javax.sound ULAW
  * converter (zero shared lines).
  */
object MulawCodec {

  /** Decode one μ-law code byte (0..255) to its 16-bit PCM value —
    * the G.711 expand closed form over the complemented code. */
  private[graft] def decodeSample(code: Int): Int = {
    val c = ~code & 0xFF
    val exp = (c >> 4) & 7
    val mant = c & 0x0F
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    if ((c & 0x80) != 0) -mag else mag
  }

  /** Encode a 16-bit PCM value to its μ-law code byte — the G.711
    * compress: bias, exponent by leading-bit position, 4-bit
    * mantissa, complement. */
  private[graft] def encodeSample(pcm: Int): Int = {
    val sign = if (pcm < 0) 0x80 else 0
    var mag = math.min(math.abs(pcm), 32635) + 0x84
    var exp = 7
    while (exp > 0 && (mag & (0x4000 >> (7 - exp))) == 0) exp -= 1
    val mant = (mag >> (exp + 3)) & 0x0F
    ~(sign | (exp << 4) | mant) & 0xFF
  }

  /** Build a WAVE file with format tag 7 (μ-law), mono, 8 bits per
    * sample, 8 kHz — the telephony container shape. */
  private[graft] def encodeWav(codes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(codes.length + 64)
    def w16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    // fmt chunk is 18 bytes for non-PCM (cbSize field present)
    tag("RIFF"); w32(4 + 8 + 18 + 8 + codes.length); tag("WAVE")
    tag("fmt "); w32(18)
    w16(7) // WAVE_FORMAT_MULAW
    w16(1) // mono
    w32(8000) // sample rate
    w32(8000) // byte rate (1 byte/sample)
    w16(1) // block align
    w16(8) // bits per sample
    w16(0) // cbSize
    tag("data"); w32(codes.length)
    bos.write(codes, 0, codes.length)
    if (codes.length % 2 != 0) bos.write(0) // word-align the chunk
    bos.toByteArray
  }

  /** STRICT μ-law WAV decode → (n, sumPcm, sumAbs, peak) over the
    * expanded 16-bit samples, or None. Scope: format tag 7, mono,
    * 8-bit; anything else (PCM, ADPCM, stereo) quarantines — the
    * codec boundary a real ingest quarantines on, not crashes. */
  private[graft] def decodeSums(b: Array[Byte]): Option[Array[Long]] = {
    def u16(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    def tag(i: Int, s: String): Boolean =
      i + 4 <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j))
    if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var fmtOk = false
    var dataAt = -1; var dataLen = -1L
    while (i + 8 <= b.length && dataAt < 0) {
      val sz = u32(i + 4)
      if (sz > b.length) return None
      if (tag(i, "fmt ")) {
        if (sz < 16 || i + 8 + 16 > b.length) return None
        fmtOk = u16(i + 8) == 7 && u16(i + 10) == 1 && u16(i + 22) == 8
      } else if (tag(i, "data")) { dataAt = i + 8; dataLen = sz }
      i += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (!fmtOk || dataAt < 0 || dataLen < 0 || dataAt + dataLen > b.length)
      return None
    val n = dataLen.toInt
    var sum = 0L; var sumAbs = 0L; var peak = 0L
    var j = 0
    while (j < n) {
      val s = decodeSample(b(dataAt + j) & 0xFF)
      sum += s
      val a = math.abs(s).toLong
      sumAbs += a
      if (a > peak) peak = a
      j += 1
    }
    Some(Array(n.toLong, sum, sumAbs, peak))
  }

  /** RAW (headerless) G.711 μ-law ingest — the capture-pipeline
    * shape (see [[AlawCodec.decodeRawSums]]): every byte one sample,
    * law/rate known only out-of-band, no container to scope-check.
    * Returns (n, sumPcm, sumAbs, peak). */
  private[graft] def decodeRawSums(b: Array[Byte]): Array[Long] = {
    var sum = 0L; var sumAbs = 0L; var peak = 0L
    var j = 0
    while (j < b.length) {
      val s = decodeSample(b(j) & 0xFF)
      sum += s
      val a = math.abs(s).toLong
      sumAbs += a
      if (a > peak) peak = a
      j += 1
    }
    Array(b.length.toLong, sum, sumAbs, peak)
  }
}

/** Deterministic in-plan μ-law WAV synthesizer + gate for d103.
  * Sample CODE bytes are a closed-form recurrence, so the oracle
  * replays the full expand arithmetic per sample — exact integer sums
  * through the lossy codec with no content restrictions (the
  * d98-grade rigor the DC-only d101 closed form couldn't give).
  * Damage slice on doc_id % 7: 0 → truncated to half (data chunk
  * falls off the buffer), 3 → RIFF magic stomped, 5 → format tag
  * stomped to 2 (ADPCM — conformant framing, a REAL codec we don't
  * implement: the scope-quarantine path). */
object MulawSim {

  private[graft] def nSamples(docId: Long): Int = (40 + docId % 77).toInt

  private[graft] def codeAt(docId: Long, j: Int): Int =
    ((docId * 31 + j.toLong * 7) % 256).toInt

  private[graft] def cleanWav(docId: Long): Array[Byte] = {
    MulawCodec.encodeWav(rawPayloadFor(docId))
  }

  /** The BARE code stream — the headerless capture shape
    * ([[MulawCodec.decodeRawSums]]'s input). */
  private[graft] def rawPayloadFor(docId: Long): Array[Byte] = {
    val n = nSamples(docId)
    val codes = new Array[Byte](n)
    var j = 0
    while (j < n) { codes(j) = codeAt(docId, j).toByte; j += 1 }
    codes
  }

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val wav = cleanWav(docId)
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(wav, wav.length / 2)
      case 3 => val d = wav.clone(); d(0) = 'X'; d
      case 5 =>
        // format tag 7 → 2 (MS ADPCM): the header stays conformant,
        // only the codec-scope check can catch it. fmt tag is at
        // offset 20 (RIFF 12 + "fmt "+size 8).
        val d = wav.clone(); d(20) = 2.toByte; d
      case _ => wav
    }
  }

  private val payloadSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  /** doc_id → payload. Map-only, id-driven: parallelizes as the scan
    * does and shuffles nothing at any corpus size. */
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
    StructField("n_samples", LongType),
    StructField("sum_pcm", LongType),
    StructField("sum_abs", LongType),
    StructField("peak", LongType)))

  /** Batched strict μ-law decode → per-clip stats with quarantine —
    * the d103 gate, same mapPartitions batch contract as
    * [[Multimodal.audioStats]]. */
  def stats(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    withPayloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            MulawCodec.decodeSums(r.getAs[Array[Byte]](1)) match {
              case Some(f) => Row(id, "ok", f(0), f(1), f(2), f(3))
              case None => Row(id, "quarantined", null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
