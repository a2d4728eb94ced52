package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FLAC — the lossless codec speech corpora actually ship in
  * (LibriSpeech, MLS, CommonVoice re-encodes) — implemented from the
  * published format (xiph.org/flac/format + RFC 9639), BOTH
  * directions, for the 16-bit mono streamable subset:
  *
  *  - the container: `fLaC` magic, metadata blocks (1-byte
  *    last/type + 24-bit BE length), STREAMINFO (block sizes, 20-bit
  *    sample rate, channels, bps, the 36-bit total-sample count, and
  *    the MD5 OF THE UNENCODED SAMPLES);
  *  - frames: the 14-bit sync, fixed-blocksize strategy, block-size /
  *    sample-rate / channel / sample-size codes (incl. the 16-bit
  *    end-of-header blocksize for the tail frame), the UTF-8-style
  *    coded frame number, CRC-8 of the header, CRC-16 of the whole
  *    frame (polynomials 0x07 / 0x8005 from the spec, built here);
  *  - subframes: CONSTANT, VERBATIM, FIXED orders 0–4, and LPC
  *    (quantized coefficients: precision, signed shift, the
  *    `(Σ c_j·s[i-1-j]) >> shift` reconstruction); the wasted-bits
  *    flag is parsed and, being outside the encoder's subset,
  *    QUARANTINES rather than guesses;
  *  - residuals: rice coding both methods (4- and 5-bit parameters),
  *    partition orders, the unary-quotient/k-bit-remainder grammar,
  *    zigzag, and the escape (raw n-bit) partitions;
  *  - THE AUDITS: CRC-8 and CRC-16 recomputed per frame, frame
  *    numbers strictly sequential, every decoded sample must fit the
  *    declared bit depth, the STREAMINFO total-sample count must
  *    equal the samples actually decoded (the lying-count class), and
  *    the STREAMINFO MD5 is RECOMPUTED over the decoded samples (the
  *    lying-checksum class — the field exists so a decoder can prove
  *    losslessness, so it is exactly the field worth auditing).
  *
  * No FLAC implementation exists in this container to pin against
  * (stated honestly — the d130 precedent): the codec is pinned by
  * encode∘decode identity on arbitrary waveforms (property-tested),
  * the closed-form oracle, bit-flip/truncation sweeps, and MD5 via
  * java.security.MessageDigest (the JDK-primitive precedent). The
  * encoder emits CONSTANT / FIXED frames chosen by residual size and,
  * on doc_id%3==2, true LPC subframes (integer coefficients), so the
  * LPC decode path runs corpus-wide.
  */
object FlacCodec {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private val BLOCK = 576
  private val BPS = 16
  private val MAX_SAMPLES = 1 << 24

  // ------------------------------------------------------------ crc

  private[graft] def crc8(b: Array[Byte], from: Int, to: Int): Int = {
    var crc = 0
    var i = from
    while (i < to) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private[graft] def crc16(b: Array[Byte], from: Int, to: Int): Int = {
    var crc = 0
    var i = from
    while (i < to) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------ bits

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream
    private var cur = 0
    private var nbits = 0
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def unary(q: Int): Unit = { bits(0L, q); bits(1L, 1) }
    def align(): Unit = if (nbits != 0) bits(0L, 8 - nbits)
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  private final class BitReader(b: Array[Byte], var pos: Int, val end: Int) {
    private var bit = 0
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        if (pos >= end) throw Malformed
        v = (v << 1) | ((b(pos) >> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        i += 1
      }
      v
    }
    def readSigned(n: Int): Int = {
      val v = readBits(n)
      (v << (64 - n) >> (64 - n)).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (readBits(1) == 0) {
        q += 1
        if (q > (1 << 20)) throw Malformed
      }
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def aligned: Boolean = bit == 0
  }

  // ---------------------------------------------------------- encode

  /** UTF-8-style coded number (the frame-number coding). */
  private def codedNumber(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) w.bits(v, 8)
    else if (v < 0x800) {
      w.bits(0xC0L | (v >> 6), 8); w.bits(0x80L | (v & 0x3F), 8)
    } else if (v < 0x10000) {
      w.bits(0xE0L | (v >> 12), 8)
      w.bits(0x80L | ((v >> 6) & 0x3F), 8)
      w.bits(0x80L | (v & 0x3F), 8)
    } else throw Malformed // frame counts in scope are far smaller
  }

  private def riceK(res: Array[Int], from: Int): Int = {
    var sum = 0L
    var i = from
    while (i < res.length) { sum += math.abs(res(i).toLong); i += 1 }
    val n = math.max(1, res.length - from)
    var k = 0
    while ((n.toLong << (k + 1)) < sum && k < 14) k += 1
    k
  }

  private def writeResidual(w: BitWriter, res: Array[Int], order: Int): Unit = {
    w.bits(0L, 2) // method 0: 4-bit rice params
    w.bits(0L, 4) // partition order 0
    val k = riceK(res, 0)
    w.bits(k.toLong, 4)
    var i = 0
    while (i < res.length) {
      val u = (res(i) << 1) ^ (res(i) >> 31)
      w.unary(u >>> k)
      if (k > 0) w.bits(u.toLong & ((1L << k) - 1), k)
      i += 1
    }
    val _ = order
  }

  private def diff(a: Array[Int]): Array[Int] = {
    val out = new Array[Int](a.length - 1)
    var i = 1
    while (i < a.length) { out(i - 1) = a(i) - a(i - 1); i += 1 }
    out
  }

  /** One frame's bytes. `lpc` replaces the fixed order-2 subframe with
    * the equivalent integer-coefficient LPC subframe. */
  private def frameBytes(samples: Array[Int], frameNo: Long,
      lpc: Boolean): Array[Byte] = {
    val bs = samples.length
    val w = new BitWriter
    w.bits(0x3FFEL, 14) // sync
    w.bits(0L, 1) // reserved
    w.bits(0L, 1) // fixed blocksize strategy
    val bsCode = if (bs == BLOCK) 0x2L else 0x7L // 576, else 16-bit at end
    w.bits(bsCode, 4)
    w.bits(0L, 4) // sample rate: from STREAMINFO
    w.bits(0L, 4) // channels: mono
    w.bits(0x4L, 3) // 16-bit samples
    w.bits(0L, 1) // reserved
    codedNumber(w, frameNo)
    if (bsCode == 0x7L) w.bits((bs - 1).toLong, 16)
    val headerSoFar = w.bytes // aligned: header fields are whole bytes
    val w2 = new BitWriter
    headerSoFar.foreach(b => w2.bits((b & 0xff).toLong, 8))
    w2.bits(crc8(headerSoFar, 0, headerSoFar.length).toLong, 8)
    // subframe
    val allSame = samples.forall(_ == samples(0))
    if (allSame) {
      w2.bits(0L, 1); w2.bits(0L, 6); w2.bits(0L, 1) // constant, no wasted
      w2.bits(samples(0).toLong & 0xffff, BPS)
    } else {
      // tiny tail frames can't afford high orders (bs-order ≥ 1)
      val d1 = if (bs >= 2) diff(samples) else Array.empty[Int]
      val d2 = if (bs >= 3) diff(d1) else Array.empty[Int]
      val s0 = samples.map(v => math.abs(v.toLong)).sum
      val s1 = if (bs >= 2) d1.map(v => math.abs(v.toLong)).sum else Long.MaxValue
      val s2 = if (bs >= 3) d2.map(v => math.abs(v.toLong)).sum else Long.MaxValue
      val order = if (s0 <= s1 && s0 <= s2) 0 else if (s1 <= s2) 1 else 2
      val res = order match {
        case 0 => samples
        case 1 => d1
        case _ => d2
      }
      if (lpc && order == 2 && bs > 2) {
        w2.bits(0L, 1)
        w2.bits(33L, 6) // LPC, order 2 (100001)
        w2.bits(0L, 1) // no wasted bits
        w2.bits((samples(0) & 0xffff).toLong, BPS)
        w2.bits((samples(1) & 0xffff).toLong, BPS)
        w2.bits(4L, 4) // precision-1: 5-bit coefficients
        w2.bits(0L, 5) // shift 0
        w2.bits(2L & 0x1f, 5) // c0 = 2   (s[i-1])
        w2.bits((-1L) & 0x1f, 5) // c1 = -1 (s[i-2])
        writeResidual(w2, res, 2)
      } else {
        w2.bits(0L, 1)
        w2.bits((8 + order).toLong, 6) // fixed
        w2.bits(0L, 1)
        var i = 0
        while (i < order) {
          w2.bits((samples(i) & 0xffff).toLong, BPS); i += 1
        }
        writeResidual(w2, res, order)
      }
    }
    val body = w2.bytes // aligned
    val out = new java.io.ByteArrayOutputStream
    out.write(body, 0, body.length)
    val c16 = crc16(body, 0, body.length)
    out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)
    out.toByteArray
  }

  /** Encode 16-bit mono samples. The lie flags plant the %7 damage. */
  private[graft] def encode(samples: Array[Int], lpc: Boolean,
      lieMd5: Boolean = false, lieTotal: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (last metadata block), 34 bytes
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    val si = new BitWriter
    si.bits(BLOCK.toLong, 16) // min blocksize
    si.bits(BLOCK.toLong, 16) // max
    si.bits(0L, 24); si.bits(0L, 24) // frame sizes unknown
    si.bits(16000L, 20) // sample rate
    si.bits(0L, 3) // channels - 1
    si.bits((BPS - 1).toLong, 5)
    si.bits(samples.length.toLong + (if (lieTotal) 1 else 0), 36)
    val md = java.security.MessageDigest.getInstance("MD5")
    samples.foreach { s => md.update((s & 0xff).toByte); md.update(((s >> 8) & 0xff).toByte) }
    val md5 = md.digest()
    if (lieMd5) md5(0) = (md5(0) ^ 0x01).toByte
    val siBytes = si.bytes
    out.write(siBytes, 0, siBytes.length)
    out.write(md5, 0, 16)
    var frameNo = 0L
    var p = 0
    while (p < samples.length) {
      val bs = math.min(BLOCK, samples.length - p)
      out.write(frameBytes(java.util.Arrays.copyOfRange(samples, p, p + bs),
        frameNo, lpc))
      frameNo += 1
      p += bs
    }
    out.toByteArray
  }

  // ---------------------------------------------------------- decode

  private def readResidual(r: BitReader, bs: Int, order: Int): Array[Int] = {
    val method = r.readBits(2).toInt
    if (method > 1) throw Malformed
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = r.readBits(4).toInt
    val nPart = 1 << po
    if (bs % nPart != 0 || (bs >> po) <= (if (po == 0) order else 0))
      throw Malformed
    val out = new Array[Int](bs - order)
    var idx = 0
    var part = 0
    while (part < nPart) {
      val n = (bs >> po) - (if (part == 0) order else 0)
      if (n < 0) throw Malformed
      val k = r.readBits(paramBits).toInt
      if (k == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < n) { out(idx) = r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < n) {
          val q = r.readUnary()
          val u = ((q.toLong << k) | r.readBits(k)).toInt
          out(idx) = (u >>> 1) ^ -(u & 1)
          idx += 1
          i += 1
        }
      }
      part += 1
    }
    out
  }

  private def codedNumberRead(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    if ((b0 & 0x80) == 0) b0.toLong
    else {
      var n = 0
      var mask = 0x40
      while ((b0 & mask) != 0) { n += 1; mask >>= 1 }
      if (n < 1 || n > 6) throw Malformed
      var v = (b0 & (mask - 1)).toLong
      var i = 0
      while (i < n) {
        val c = r.readBits(8).toInt
        if ((c & 0xC0) != 0x80) throw Malformed
        v = (v << 6) | (c & 0x3F)
        i += 1
      }
      v
    }
  }

  final case class FlacInfo(sampleRate: Int, totalSamples: Long,
      nFrames: Int, samples: Array[Int])

  /** Strict decode with every audit; None quarantines. */
  def decode(b: Array[Byte]): Option[FlacInfo] =
    try {
      if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
        b(3) != 'C') throw Malformed
      var p = 4
      var streaminfo: Array[Byte] = null
      var last = false
      while (!last) {
        if (p + 4 > b.length) throw Malformed
        val h = b(p) & 0xff
        last = (h & 0x80) != 0
        val tpe = h & 0x7f
        val len = ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) |
          (b(p + 3) & 0xff)
        p += 4
        if (p + len > b.length) throw Malformed
        if (tpe == 0) {
          if (streaminfo != null || len != 34) throw Malformed
          streaminfo = java.util.Arrays.copyOfRange(b, p, p + len)
        } else if (tpe == 127) throw Malformed // invalid per spec
        p += len
      }
      if (streaminfo == null) throw Malformed
      val sr = new BitReader(streaminfo, 0, 34)
      val minBs = sr.readBits(16).toInt
      val maxBs = sr.readBits(16).toInt
      if (minBs < 16 || maxBs < minBs) throw Malformed
      sr.readBits(24); sr.readBits(24)
      val rate = sr.readBits(20).toInt
      val channels = sr.readBits(3).toInt + 1
      val bps = sr.readBits(5).toInt + 1
      if (rate == 0 || channels != 1 || bps != BPS) throw Malformed // scope
      val totalDeclared = sr.readBits(36)
      if (totalDeclared > MAX_SAMPLES) throw Malformed
      val md5Declared = java.util.Arrays.copyOfRange(streaminfo, 18, 34)
      val out = Array.newBuilder[Int]
      var total = 0L
      var frameNo = 0L
      while (p < b.length) {
        val frameStart = p
        val r = new BitReader(b, p, b.length)
        if (r.readBits(14) != 0x3FFE) throw Malformed
        if (r.readBits(1) != 0) throw Malformed
        if (r.readBits(1) != 0) throw Malformed // fixed strategy only
        val bsCode = r.readBits(4).toInt
        val rateCode = r.readBits(4).toInt
        val chanCode = r.readBits(4).toInt
        val sizeCode = r.readBits(3).toInt
        if (r.readBits(1) != 0) throw Malformed
        if (chanCode != 0) throw Malformed // mono scope
        if (sizeCode != 4) throw Malformed // 16-bit scope
        val num = codedNumberRead(r)
        if (num != frameNo) throw Malformed // strictly sequential
        var bs = bsCode match {
          case 1 => 192
          case c if c >= 2 && c <= 5 => 576 << (c - 2)
          case 6 => r.readBits(8).toInt + 1
          case 7 => r.readBits(16).toInt + 1
          case c if c >= 8 => 256 << (c - 8)
          case _ => throw Malformed
        }
        rateCode match {
          case 0 => // from STREAMINFO
          case 12 => r.readBits(8)
          case 13 | 14 => r.readBits(16)
          case 15 => throw Malformed
          case _ => // table codes: fixed rates, nothing to read
        }
        if (bs < 1 || bs > maxBs || total + bs > MAX_SAMPLES) throw Malformed
        // CRC-8 covers the whole header (it ends byte-aligned)
        if (!r.aligned) throw Malformed
        val headerEnd = r.pos
        val c8 = r.readBits(8).toInt
        if (c8 != crc8(b, frameStart, headerEnd)) throw Malformed
        // subframe
        if (r.readBits(1) != 0) throw Malformed
        val tpe = r.readBits(6).toInt
        if (r.readBits(1) != 0) throw Malformed // wasted bits: out of scope
        val samples: Array[Int] = tpe match {
          case 0 => // constant
            val v = r.readSigned(BPS)
            Array.fill(bs)(v)
          case 1 => // verbatim
            val a = new Array[Int](bs)
            var i = 0
            while (i < bs) { a(i) = r.readSigned(BPS); i += 1 }
            a
          case t if t >= 8 && t <= 12 => // fixed, order 0-4
            val order = t - 8
            if (order > bs) throw Malformed
            val warm = new Array[Int](order)
            var i = 0
            while (i < order) { warm(i) = r.readSigned(BPS); i += 1 }
            val res = readResidual(r, bs, order)
            val a = new Array[Int](bs)
            System.arraycopy(warm, 0, a, 0, order)
            i = order
            while (i < bs) {
              val pred: Long = order match {
                case 0 => 0L
                case 1 => a(i - 1).toLong
                case 2 => 2L * a(i - 1) - a(i - 2)
                case 3 => 3L * a(i - 1) - 3L * a(i - 2) + a(i - 3)
                case _ => 4L * a(i - 1) - 6L * a(i - 2) + 4L * a(i - 3) - a(i - 4)
              }
              val v = pred + res(i - order)
              if (v < -32768 || v > 32767) throw Malformed // must fit bps
              a(i) = v.toInt
              i += 1
            }
            a
          case t if t >= 32 => // LPC, order = t - 31
            val order = t - 31
            if (order > bs) throw Malformed
            val warm = new Array[Int](order)
            var i = 0
            while (i < order) { warm(i) = r.readSigned(BPS); i += 1 }
            val precision = r.readBits(4).toInt + 1
            if (precision > 15) throw Malformed
            val shift = r.readSigned(5)
            if (shift < 0) throw Malformed
            val coefs = new Array[Int](order)
            i = 0
            while (i < order) { coefs(i) = r.readSigned(precision); i += 1 }
            val res = readResidual(r, bs, order)
            val a = new Array[Int](bs)
            System.arraycopy(warm, 0, a, 0, order)
            i = order
            while (i < bs) {
              var acc = 0L
              var j = 0
              while (j < order) { acc += coefs(j).toLong * a(i - 1 - j); j += 1 }
              val v = (acc >> shift) + res(i - order)
              if (v < -32768 || v > 32767) throw Malformed
              a(i) = v.toInt
              i += 1
            }
            a
          case _ => throw Malformed // reserved types
        }
        r.align()
        val c16 = (r.readBits(8).toInt << 8) | r.readBits(8).toInt
        if (c16 != crc16(b, frameStart, r.pos - 2)) throw Malformed
        out ++= samples
        total += bs
        frameNo += 1
        p = r.pos
      }
      if (total != totalDeclared) throw Malformed // the lying-count audit
      val all = out.result()
      val md = java.security.MessageDigest.getInstance("MD5")
      all.foreach { s =>
        md.update((s & 0xff).toByte); md.update(((s >> 8) & 0xff).toByte)
      }
      if (!java.util.Arrays.equals(md.digest(), md5Declared))
        throw Malformed // the lying-checksum audit
      Some(FlacInfo(rate, totalDeclared, frameNo.toInt, all))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
}

/** In-plan synthesizer + gate for d147: each doc a 16-bit mono FLAC
  * of K = 2000 + doc_id%500 samples from the closed-form waveform
  * s(i) = ((doc_id*7 + i*i) % 2048) - 1024 — varied enough that fixed
  * predictors and rice partitions do real work — LPC subframes on
  * doc_id%3==2 docs. Damage %7: 0 → truncation; 3 → a LYING
  * STREAMINFO MD5 (every frame and CRC intact — only the final
  * recompute catches the field that exists to prove losslessness);
  * 5 → a LYING total-sample count (frames intact — only the count
  * audit catches it). */
object FlacSim {

  private[graft] def k(docId: Long): Int = (2000 + docId % 500).toInt

  private[graft] def sample(docId: Long, i: Int): Int =
    (((docId * 7 + i.toLong * i) % 2048) - 1024).toInt

  private[graft] def samplesFor(docId: Long): Array[Int] =
    Array.tabulate(k(docId))(i => sample(docId, i))

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val mode = docId % 7
    val clean = FlacCodec.encode(samplesFor(docId), lpc = docId % 3 == 2,
      lieMd5 = mode == 3, lieTotal = mode == 5)
    if (mode == 0) java.util.Arrays.copyOf(clean, clean.length - 11)
    else clean
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_frames", LongType),
    StructField("n_samples", LongType),
    StructField("sum_samples", LongType),
    StructField("min_s", LongType),
    StructField("max_s", LongType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            FlacCodec.decode(payloadFor(id)) match {
              case Some(info) =>
                var sum = 0L
                var mn = Long.MaxValue
                var mx = Long.MinValue
                info.samples.foreach { s =>
                  sum += s
                  if (s < mn) mn = s
                  if (s > mx) mx = s
                }
                Iterator.single(Row(id, info.nFrames.toLong,
                  info.samples.length.toLong, sum, mn, mx))
              case None => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
