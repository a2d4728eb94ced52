package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** G.711 A-law codec for the d116 gate — the OTHER half of the G.711
  * pair (μ-law is d103; European/international telephony ships A-law,
  * WAVE format tag 6). Like μ-law it is lossy but memoryless: each
  * code byte expands by a pure integer closed form over the 0x55-XORed
  * code —
  *
  *   t = (mant·16 + (seg == 0 ? 8 : 264)) << max(0, seg − 1)
  *
  * with the sign bit SET meaning positive (A-law's inverted-sign
  * convention, the opposite of μ-law's complement) — so the oracle
  * replays the full expand arithmetic per sample in SQL, exact sums
  * with no content restrictions.
  *
  * Reference anchor: same constructor∘decoder pattern as the
  * d89-d115 gates (SURVEY §2.5); the independent decoder pinned in
  * MediaDecodePropertySpec is the JDK's own javax.sound ALAW
  * converter over the whole code table (zero shared lines).
  */
object AlawCodec {

  /** Decode one A-law code byte (0..255) to its 16-bit PCM value —
    * the G.711 expand closed form over the XORed code. */
  private[graft] def decodeSample(code: Int): Int = {
    val c = (code ^ 0x55) & 0xFF
    val seg = (c >> 4) & 7
    val mant = c & 0x0F
    var t = (mant << 4) + (if (seg == 0) 8 else 0x108)
    if (seg >= 2) t <<= (seg - 1)
    if ((c & 0x80) != 0) t else -t
  }

  /** Encode a 16-bit PCM value to its A-law code byte — the G.711
    * compress: 13-bit reduction, segment search, 4-bit mantissa,
    * 0x55/0xD5 mask. */
  private[graft] def encodeSample(pcm0: Int): Int = {
    var pcm = pcm0 >> 3 // 13-bit domain
    val mask = if (pcm >= 0) 0xD5 else { pcm = -pcm - 1; 0x55 }
    val segEnd = Array(0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)
    var seg = 0
    while (seg < 8 && pcm > segEnd(seg)) seg += 1
    if (seg >= 8) 0x7F ^ mask
    else {
      val mant = if (seg < 2) (pcm >> 1) & 0x0F else (pcm >> seg) & 0x0F
      ((seg << 4) | mant) ^ mask
    }
  }

  /** Build a WAVE file with format tag 6 (A-law), mono, 8 bits per
    * sample, 8 kHz. */
  private[graft] def encodeWav(codes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(codes.length + 64)
    def w16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    tag("RIFF"); w32(4 + 8 + 18 + 8 + codes.length); tag("WAVE")
    tag("fmt "); w32(18)
    w16(6) // WAVE_FORMAT_ALAW
    w16(1); w32(8000); w32(8000); w16(1); w16(8); w16(0)
    tag("data"); w32(codes.length)
    bos.write(codes, 0, codes.length)
    if (codes.length % 2 != 0) bos.write(0)
    bos.toByteArray
  }

  /** STRICT A-law WAV decode → (n, sumPcm, sumAbs, peak), or None.
    * Scope: format tag 6, mono, 8-bit; anything else — INCLUDING
    * μ-law's tag 7, which d103's decoder owns — quarantines. */
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
        fmtOk = u16(i + 8) == 6 && u16(i + 10) == 1 && u16(i + 22) == 8
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

  /** RAW (headerless) G.711 A-law ingest — the capture-pipeline
    * shape: telephony taps ship BARE sample streams, with law and
    * rate known only out-of-band. Every byte is one sample; there is
    * no container to scope-check, so this path is exactly as safe as
    * its out-of-band parameters — which is why the WAV walkers above
    * must reject the sibling tag: once framing is gone, nothing in
    * the data itself distinguishes the two laws. Returns
    * (n, sumPcm, sumAbs, peak), same contract as [[decodeSums]]. */
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

/** Deterministic in-plan A-law WAV synthesizer + gate for d116 — the
  * d103 discipline on the other G.711 half. Code bytes follow a
  * closed-form recurrence (different constants than d103 so the two
  * gates never share streams); the oracle replays the full expand
  * arithmetic per sample. Damage slice on doc_id % 7: 0 → truncated
  * to half, 3 → RIFF magic stomped, 5 → format tag stomped to 7 —
  * μ-LAW, the sibling codec: each G.711 half must REJECT the other
  * (decoding A-law bytes with the μ-law expand yields silently wrong
  * audio; the scope check is what stands between them). */
object AlawSim {

  private[graft] def nSamples(docId: Long): Int = (40 + docId % 83).toInt

  private[graft] def codeAt(docId: Long, j: Int): Int =
    ((docId * 37 + j.toLong * 11) % 256).toInt

  private[graft] def cleanWav(docId: Long): Array[Byte] = {
    val n = nSamples(docId)
    val codes = new Array[Byte](n)
    var j = 0
    while (j < n) { codes(j) = codeAt(docId, j).toByte; j += 1 }
    AlawCodec.encodeWav(codes)
  }

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val wav = cleanWav(docId)
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(wav, wav.length / 2)
      case 3 => val d = wav.clone(); d(0) = 'X'; d
      case 5 =>
        // fmt tag 6 → 7 (μ-law): conformant framing, only the codec
        // scope check catches the swap. fmt tag at offset 20.
        val d = wav.clone(); d(20) = 7.toByte; d
      case _ => wav
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
    StructField("n_samples", LongType),
    StructField("sum_pcm", LongType),
    StructField("sum_abs", LongType),
    StructField("peak", LongType),
    StructField("raw_match", BooleanType)))

  /** The BARE code stream for a doc — the headerless capture shape
    * ([[AlawCodec.decodeRawSums]]'s input): same closed-form codes,
    * no RIFF container. */
  private[graft] def rawPayloadFor(docId: Long): Array[Byte] = {
    val n = nSamples(docId)
    val codes = new Array[Byte](n)
    var j = 0
    while (j < n) { codes(j) = codeAt(docId, j).toByte; j += 1 }
    codes
  }

  /** Batched strict A-law decode → per-clip stats with quarantine —
    * the d116 gate, same mapPartitions batch contract as the other
    * codec gates. `raw_match` (r12) exercises the HEADERLESS ingest
    * path: the doc's bare code stream through
    * [[AlawCodec.decodeRawSums]] must reproduce the container walk's
    * sums field-for-field — the capture-pipeline shape where law and
    * rate are out-of-band parameters. */
  def stats(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    withPayloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            AlawCodec.decodeSums(r.getAs[Array[Byte]](1)) match {
              case Some(f) =>
                val raw = AlawCodec.decodeRawSums(rawPayloadFor(id))
                Row(id, "ok", f(0), f(1), f(2), f(3),
                  java.lang.Boolean.valueOf(java.util.Arrays.equals(raw, f)))
              case None => Row(id, "quarantined", null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
