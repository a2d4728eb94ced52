package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IMA/DVI ADPCM (WAVE format tag 0x11) codec for the d110 gate — the
  * first STATEFUL audio codec in the family: μ-law (d103) expands each
  * byte independently; ADPCM carries a (predictor, step-index) state
  * across samples, so decode order IS the data. The state machine is
  * the published IMA algorithm: 89-entry step table, 4-bit codes,
  * `diff = step/8 (+step/4)(+step/2)(+step)` by code bits, sign bit 8,
  * predictor clamped to int16, index walked by the signed index table
  * and clamped to [0, 88].
  *
  * Container scope (the d98 discipline): mono 4-bit fmt-0x11 WAV with
  * the 2-byte cbSize extension (samplesPerBlock), a `fact` chunk
  * carrying the true sample count, and block-aligned data — each
  * block a 4-byte header (initial predictor int16le, step index u8,
  * reserved 0) that IS the block's first output sample, then
  * low-nibble-first code bytes; the last block may be partial with
  * ZERO pad nibbles (what our encoder writes; garbage padding
  * quarantines). Anything else — other tags (including μ-law: d103
  * owns 7), stereo, 3-bit, a step index past 88, samplesPerBlock
  * disagreeing with blockAlign — QUARANTINES rather than crashes.
  *
  * Reference anchor: same constructor∘decoder discipline as the
  * d89-d109 gates (SURVEY §2.5). The oracle replays the ENTIRE
  * stateful recurrence as a recursive CTE — every step of the
  * predictor/index walk is engine-exact integer arithmetic.
  */
object AdpcmCodec {

  private[graft] val STEP: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private[graft] val INDEX_ADJ: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** One IMA step: (pred, idx, code) → (pred', idx'). Pure integer. */
  private[graft] def step(pred: Int, idx: Int, code: Int): (Int, Int) = {
    val s = STEP(idx)
    var diff = s >> 3
    if ((code & 1) != 0) diff += s >> 2
    if ((code & 2) != 0) diff += s >> 1
    if ((code & 4) != 0) diff += s
    val p0 = if ((code & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, idx + INDEX_ADJ(code & 7)))
    (p, i)
  }

  /** STRICT decode → all output samples in order, or None for
    * anything malformed or out of scope (see scope above). */
  private[graft] def decode(b: Array[Byte]): Option[Array[Int]] = {
    def u16(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    def s16(i: Int): Int = u16(i).toShort.toInt
    def u32(i: Int): Long = (u16(i).toLong) | (u16(i + 2).toLong << 16)
    def tag(i: Int, s: String): Boolean =
      i + 4 <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j))
    try {
      if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
      if (u32(4) != b.length.toLong - 8) throw Malformed
      var blockAlign = -1; var spb = -1
      var total = -1L
      var dataAt = -1; var dataEnd = -1
      var i = 12
      while (i + 8 <= b.length) {
        val sz = u32(i + 4)
        if (i + 8 + sz > b.length) throw Malformed
        if (tag(i, "fmt ")) {
          if (sz != 20) throw Malformed // 16 + cbSize(2) + samplesPerBlock(2)
          if (u16(i + 8) != 0x11) throw Malformed // IMA ADPCM only
          if (u16(i + 10) != 1) throw Malformed // mono
          blockAlign = u16(i + 20)
          if (u16(i + 22) != 4) throw Malformed // 4-bit
          if (u16(i + 24) != 2) throw Malformed // cbSize
          spb = u16(i + 26)
          if (blockAlign < 5 || spb != (blockAlign - 4) * 2 + 1) throw Malformed
        } else if (tag(i, "fact")) {
          if (sz < 4) throw Malformed
          total = u32(i + 8)
        } else if (tag(i, "data")) {
          dataAt = i + 8; dataEnd = i + 8 + sz.toInt
        }
        i += 8 + sz.toInt + (sz.toInt & 1)
      }
      if (blockAlign < 0 || total < 0 || dataAt < 0) throw Malformed
      if (total > (1L << 24)) throw Malformed
      val n = total.toInt
      val nBlocks = (n + spb - 1) / spb
      if (n == 0 || dataEnd - dataAt != nBlocks * blockAlign) throw Malformed
      val out = new Array[Int](n)
      var t = 0
      var blk = 0
      while (blk < nBlocks) {
        val base = dataAt + blk * blockAlign
        var pred = s16(base)
        var idx = b(base + 2) & 0xFF
        if (idx > 88) throw Malformed
        if (b(base + 3) != 0) throw Malformed // reserved
        out(t) = pred; t += 1
        val inBlock = math.min(spb, n - blk * spb)
        var k = 1
        var nib = 0
        while (nib < (blockAlign - 4) * 2) {
          val byte = b(base + 4 + (nib >> 1)) & 0xFF
          val code = if ((nib & 1) == 0) byte & 0x0F else byte >> 4
          if (k < inBlock) {
            val (p, ix) = step(pred, idx, code)
            pred = p; idx = ix
            out(t) = pred; t += 1
            k += 1
          } else if (code != 0) throw Malformed // pad nibbles must be zero
          nib += 1
        }
        blk += 1
      }
      Some(out)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}

/** d110 gate — IMA ADPCM streams synthesized IN-PLAN from closed-form
  * code nibbles: the "signal" IS whatever the published state machine
  * decodes from codes `(doc_id·7 + k·5) % 16`, predictor seed
  * `(doc_id·131) % 65536 − 32768`, index seed `doc_id % 89` — so
  * every code path (all 16 codes, both clamps, the full step-table
  * walk) is exercised corpus-wide and the oracle can replay the WHOLE
  * stateful recurrence as a recursive CTE, exact to the last sample.
  * Multi-block: the encoder opens each new block with the RUNNING
  * state in the 4-byte header (ffmpeg's convention — the header
  * sample is the block's first output sample), so blocks stay
  * independently seekable while the recurrence stays seamless.
  * Damage slice on doc_id%7: 0 → truncated mid-data, 3 → fmt tag
  * stomped to 1 (PCM — out of THIS decoder's scope; the mirror of
  * d103's stomp toward 0x11), 5 → first block's step index byte
  * stomped to 255 (>88 — the range check the state machine needs). */
object AdpcmSim {

  private[graft] def nSamples(docId: Long): Int = (20 + docId % 31).toInt
  // ≡1 (mod 4) so blockAlign = 4 + (spb-1)/2 stays even — no RIFF
  // trailing-pad ambiguity on the data chunk
  private[graft] def samplesPerBlock(docId: Long): Int = (9 + (docId % 8) * 4).toInt
  private[graft] def predSeed(docId: Long): Int = ((docId * 131) % 65536).toInt - 32768
  private[graft] def idxSeed(docId: Long): Int = (docId % 89).toInt
  private[graft] def code(docId: Long, k: Int): Int = ((docId * 7 + k * 5L) % 16).toInt

  private def w16le(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }
  private def w32le(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    w16le(out, (v & 0xFFFF).toInt); w16le(out, ((v >> 16) & 0xFFFF).toInt)
  }
  private def tag(out: java.io.ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  private[graft] def cleanWav(docId: Long, stompTag: Boolean = false,
                              stompIdx: Boolean = false): Array[Byte] = {
    val n = nSamples(docId)
    val spb = samplesPerBlock(docId)
    val blockAlign = 4 + (spb - 1) / 2
    val nBlocks = (n + spb - 1) / spb
    // run the state machine, packing codes block by block
    val data = new java.io.ByteArrayOutputStream(nBlocks * blockAlign)
    var pred = predSeed(docId)
    var idx = idxSeed(docId)
    var t = 0 // output samples emitted
    var k = 0 // codes consumed
    var blk = 0
    while (blk < nBlocks) {
      w16le(data, pred & 0xFFFF)
      data.write(if (stompIdx && blk == 0) 0xFF else idx)
      data.write(0)
      t += 1 // the header sample
      val inBlock = math.min(spb, n - blk * spb)
      var nib = 0
      var cur = 0
      while (nib < (blockAlign - 4) * 2) {
        val c = if (nib + 2 <= inBlock) { // codes 0..inBlock-2 of this block
          val cc = code(docId, k); k += 1
          val (p, ix) = AdpcmCodec.step(pred, idx, cc)
          pred = p; idx = ix; t += 1
          cc
        } else 0 // zero pad
        if ((nib & 1) == 0) cur = c else { data.write(cur | (c << 4)); cur = 0 }
        nib += 1
      }
      blk += 1
    }
    val dataB = data.toByteArray
    val out = new java.io.ByteArrayOutputStream(dataB.length + 64)
    tag(out, "RIFF")
    w32le(out, 4 + 8 + 20 + 8 + 4 + 8 + dataB.length.toLong)
    tag(out, "WAVE")
    tag(out, "fmt "); w32le(out, 20)
    w16le(out, if (stompTag) 1 else 0x11) // wFormatTag
    w16le(out, 1) // channels
    w32le(out, 8000) // sample rate
    w32le(out, 8000L * blockAlign / spb) // nominal byte rate
    w16le(out, blockAlign)
    w16le(out, 4) // bits per sample
    w16le(out, 2) // cbSize
    w16le(out, spb)
    tag(out, "fact"); w32le(out, 4); w32le(out, n.toLong)
    tag(out, "data"); w32le(out, dataB.length.toLong)
    out.write(dataB, 0, dataB.length)
    out.toByteArray
  }

  private[graft] def payloadFor(docId: Long): Array[Byte] =
    (docId % 7) match {
      case 0 =>
        val clean = cleanWav(docId)
        java.util.Arrays.copyOf(clean, clean.length - 3)
      case 3 => cleanWav(docId, stompTag = true)
      case 5 => cleanWav(docId, stompIdx = true)
      case _ => cleanWav(docId)
    }

  private val payloadSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  /** doc_id → ADPCM WAV payload. Map-only, id-driven. */
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
    StructField("sample_sum", LongType),
    StructField("last_sample", LongType)))

  /** Batched strict decode → per-clip stats with quarantine — the
    * d110 gate, same mapPartitions batch contract as the other codec
    * gates. */
  def stats(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    withPayloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            AdpcmCodec.decode(r.getAs[Array[Byte]](1)) match {
              case Some(samples) =>
                var s = 0L
                var i = 0
                while (i < samples.length) { s += samples(i); i += 1 }
                Row(id, "ok", samples.length.toLong, s,
                  samples.last.toLong)
              case None =>
                Row(id, "quarantined", null, null, null)
            }
          }
        }
      }(enc)
  }
}
