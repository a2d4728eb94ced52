package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** bzip2 codec for the d125 gate — the Wikipedia-dump container
  * (.xml.bz2 / .jsonl.bz2), the classic public-corpus compression the
  * sweep hadn't covered, implemented from the published format in BOTH
  * directions with no borrowed primitive: the initial run-length layer
  * (RLE1: runs of 4-255 as four bytes + a count byte), the
  * Burrows-Wheeler transform (rotation sort via prefix doubling —
  * O(n log^2 n), safe on pathological periodic input), move-to-front
  * over the used-symbol alphabet, zero-run RLE2 in bijective base 2
  * (RUNA/RUNB), multi-table canonical Huffman with per-50-symbol group
  * selectors (themselves MTF + unary coded), delta-coded code lengths,
  * the two-level CRC scheme (per-block CRC-32 MSB-first poly 0x04C11DB7
  * over the PRE-RLE1 data, plus the rotate-combined stream CRC), and
  * MSB-first bit packing throughout — the opposite bit order of
  * DEFLATE (d124).
  *
  * Decoder scope (the d98/d117 strictness discipline): header grammar
  * (BZh + level 1-9), block magic 0x314159265359, footer magic
  * 0x177245385090; the deprecated RANDOMIZED flag is REJECTED (legacy
  * bzip2 0.9.0 only — the d125 damage slice sets it); empty symbol
  * maps, nGroups outside 2..6, selector values >= nGroups, code
  * lengths outside 1..20, over-subscribed or incomplete Huffman
  * tables, running out of selectors, BWT output past the level's
  * 100k*level limit, origPtr >= block length, a trailing RLE1 run
  * with no count byte, block-CRC and combined-CRC mismatches,
  * truncation and trailing garbage all QUARANTINE rather than crash.
  *
  * Interop pinned BOTH directions against commons-compress
  * (BZip2Compressor{Input,Output}Stream, on the Spark classpath — the
  * d122 precedent): its writer's output decodes in our walker
  * (multi-table, real selector schedules) and our encoder's streams
  * read back byte-exact through its reader.
  *
  * Reference behavior anchor: slurm2sql ingests compressed dumps
  * (slurm2sql.py:854-914 reads sacct output however shipped); the
  * coder itself is from the public bzip2 format description only.
  */
object Bzip2Codec {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private val MAX_BYTES = 1 << 26

  // ----------------------------------------------------------- bzip2 CRC

  /** bzip2's CRC-32: poly 0x04C11DB7, MSB-first (NOT the reflected
    * zip/PNG variant), init 0xFFFFFFFF, final complement. */
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04C11DB7 else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private[graft] def blockCrc(b: Array[Byte], off: Int, len: Int): Int = {
    var crc = 0xFFFFFFFF
    var i = off
    val end = off + len
    while (i < end) {
      crc = (crc << 8) ^ crcTable(((crc >>> 24) ^ (b(i) & 0xFF)) & 0xFF)
      i += 1
    }
    ~crc
  }

  // ------------------------------------------------------- bit plumbing

  /** MSB-first bit reader (bzip2 packs bits big-endian). */
  private final class MsbBits(buf: Array[Byte], end: Int) {
    private var pos = 0
    private var bit = 0
    def readBit(): Int = {
      if (pos >= end) throw Malformed
      val v = ((buf(pos) & 0xFF) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readBitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** True when only zero padding (< 8 bits) remains to the end. */
    def atPaddedEnd: Boolean =
      if (bit == 0) pos >= end
      else pos == end - 1 && ((buf(pos) << bit) & 0xFF) == 0
  }

  private[operators] final class MsbWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    var bitLen: Long = 0
    def add(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1).toInt
        nb += 1
        if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
        i -= 1
      }
      bitLen += bits
    }
    def finish(): Array[Byte] = {
      if (nb > 0) { out.write(cur << (8 - nb)); cur = 0; nb = 0 }
      out.toByteArray
    }
  }

  // ------------------------------------------------------ huffman (MSB)

  /** Canonical Huffman decoder, MSB-first, lengths 1..maxLen, COMPLETE
    * sets required (bzip2 tables assign a code to every alphabet
    * symbol, so a hole is corruption). */
  private final class Huff(lengths: Array[Int], maxLen: Int) {
    private val count = new Array[Int](maxLen + 1)
    locally {
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l < 1 || l > maxLen) throw Malformed
        count(l) += 1
        i += 1
      }
      var left = 1
      var l = 1
      while (l <= maxLen) {
        left <<= 1
        left -= count(l)
        if (left < 0) throw Malformed
        l += 1
      }
      if (left != 0) throw Malformed
    }
    private val offs = new Array[Int](maxLen + 1)
    locally {
      var l = 1
      while (l < maxLen) { offs(l + 1) = offs(l) + count(l); l += 1 }
    }
    private val syms = new Array[Int](lengths.length)
    locally {
      val next = offs.clone()
      var s = 0
      while (s < lengths.length) {
        val l = lengths(s)
        syms(next(l)) = s; next(l) += 1
        s += 1
      }
    }
    def decode(r: MsbBits): Int = {
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= maxLen) {
        code |= r.readBit()
        val c = count(len)
        if (code - first < c) return syms(index + (code - first))
        index += c
        first = (first + c) << 1
        code <<= 1
        len += 1
      }
      throw Malformed
    }
  }

  // --------------------------------------------------------------- BWT

  /** Rotation sort via prefix doubling over cyclic indices: rank pairs
    * (rank[i], rank[(i+k) mod n]) sorted each round — O(n log^2 n),
    * immune to periodic input. Returns the sorted rotation order. */
  private[graft] def sortRotations(s: Array[Byte]): Array[Int] = {
    val n = s.length
    val sa = Array.tabulate(n)(identity)
    var rank = Array.tabulate(n)(i => s(i) & 0xFF)
    var tmp = new Array[Int](n)
    var k = 1
    var done = false
    while (!done) {
      val kk = k
      val r = rank
      val keys = new Array[Long](n)
      var i = 0
      while (i < n) {
        val j = sa(i)
        val second = r((j + kk) % n)
        keys(i) = (r(j).toLong << 21) | second.toLong
        i += 1
      }
      // sort indices by key: pack key<<20|idx into Long (n < 2^20)
      val packed = new Array[Long](n)
      i = 0
      while (i < n) { packed(i) = (keys(i) << 21) | sa(i).toLong; i += 1 }
      java.util.Arrays.sort(packed)
      i = 0
      while (i < n) { sa(i) = (packed(i) & 0x1FFFFF).toInt; i += 1 }
      // re-rank
      tmp(sa(0)) = 0
      i = 1
      while (i < n) {
        val prevKey = (packed(i - 1) >>> 21)
        val curKey = (packed(i) >>> 21)
        tmp(sa(i)) = tmp(sa(i - 1)) + (if (curKey == prevKey) 0 else 1)
        i += 1
      }
      val t = rank; rank = tmp; tmp = t
      done = rank(sa(n - 1)) == n - 1 || k >= n
      k <<= 1
    }
    sa
  }

  /** BWT: last column + the original string's row index. */
  private[graft] def bwt(s: Array[Byte]): (Array[Byte], Int) = {
    val n = s.length
    val sa = sortRotations(s)
    val last = new Array[Byte](n)
    var orig = -1
    var i = 0
    while (i < n) {
      val j = sa(i)
      last(i) = s((j + n - 1) % n)
      if (j == 0) orig = i
      i += 1
    }
    (last, orig)
  }

  /** Inverse BWT (the standard tt-vector walk). */
  private def unBwt(last: Array[Byte], origPtr: Int): Array[Byte] = {
    val n = last.length
    if (origPtr < 0 || origPtr >= n) throw Malformed
    val counts = new Array[Int](256)
    var i = 0
    while (i < n) { counts(last(i) & 0xFF) += 1; i += 1 }
    val base = new Array[Int](256)
    var acc = 0
    i = 0
    while (i < 256) { base(i) = acc; acc += counts(i); i += 1 }
    val tt = new Array[Int](n)
    i = 0
    while (i < n) {
      val c = last(i) & 0xFF
      tt(base(c)) = i
      base(c) += 1
      i += 1
    }
    val out = new Array[Byte](n)
    var p = tt(origPtr)
    i = 0
    while (i < n) { out(i) = last(p); p = tt(p); i += 1 }
    out
  }

  // --------------------------------------------------------------- RLE1

  /** bzip2's initial RLE: a run of 4-255 equal bytes becomes the four
    * bytes plus a count byte (0-251) of EXTRA repeats. */
  private[operators] def rle1Encode(src: Array[Byte], off: Int, len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(len + 16)
    var i = off
    val end = off + len
    while (i < end) {
      val b = src(i)
      var run = 1
      while (i + run < end && run < 255 && src(i + run) == b) run += 1
      if (run >= 4) {
        out.write(b); out.write(b); out.write(b); out.write(b)
        out.write(run - 4)
      } else {
        var k = 0
        while (k < run) { out.write(b); k += 1 }
      }
      i += run
    }
    out.toByteArray
  }

  private def rle1Decode(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(src.length + 16)
    var i = 0
    var run = 0
    var prev = -1
    while (i < src.length) {
      val b = src(i) & 0xFF
      if (run == 4) { // b is the count byte
        var k = 0
        while (k < b) { out.write(prev); k += 1 }
        run = 0
        prev = -1
      } else {
        if (b == prev) run += 1 else { run = 1; prev = b }
        out.write(b)
      }
      if (out.size() > MAX_BYTES) throw Malformed
      i += 1
    }
    if (run == 4) throw Malformed // a 4-run must carry its count byte
    out.toByteArray
  }

  // -------------------------------------------------------------- decode

  private val BLOCK_MAGIC = 0x314159265359L
  private val FOOTER_MAGIC = 0x177245385090L

  /** Strict decode of a whole .bz2 stream. Returns (content,
    * blockCount); None on any violation. */
  private[graft] def decode(b: Array[Byte]): Option[(Array[Byte], Int)] =
    try {
      val r = new MsbBits(b, b.length)
      if (r.readBits(8) != 'B' || r.readBits(8) != 'Z' || r.readBits(8) != 'h')
        throw Malformed
      val level = r.readBits(8) - '0'
      if (level < 1 || level > 9) throw Malformed
      val limit = level * 100000
      val out = new java.io.ByteArrayOutputStream()
      var combined = 0
      var nBlocks = 0
      var footer = false
      while (!footer) {
        val magic = r.readBitsLong(48)
        if (magic == FOOTER_MAGIC) footer = true
        else if (magic == BLOCK_MAGIC) {
          val declaredCrc = r.readBits(32)
          if (r.readBit() == 1) throw Malformed // RANDOMIZED: legacy, rejected
          val origPtr = r.readBits(24)
          // symbol map: 16 range bits, then 16 bits per used range
          val ranges = r.readBits(16)
          val used = new Array[Boolean](256)
          var nUsed = 0
          var g = 0
          while (g < 16) {
            if (((ranges >> (15 - g)) & 1) == 1) {
              val bits = r.readBits(16)
              var j = 0
              while (j < 16) {
                if (((bits >> (15 - j)) & 1) == 1) {
                  used(g * 16 + j) = true
                  nUsed += 1
                }
                j += 1
              }
            }
            g += 1
          }
          if (nUsed == 0) throw Malformed
          val seqToUnseq = new Array[Int](nUsed)
          var si = 0
          var c = 0
          while (c < 256) { if (used(c)) { seqToUnseq(si) = c; si += 1 }; c += 1 }
          val alphaSize = nUsed + 2
          val nGroups = r.readBits(3)
          if (nGroups < 2 || nGroups > 6) throw Malformed
          val nSelectors = r.readBits(15)
          if (nSelectors < 1) throw Malformed
          // selectors: unary, then MTF-decoded over group indices
          val selMtf = Array.tabulate(nGroups)(identity)
          val selectors = new Array[Int](nSelectors)
          var s = 0
          while (s < nSelectors) {
            var j = 0
            while (r.readBit() == 1) {
              j += 1
              if (j >= nGroups) throw Malformed
            }
            val v = selMtf(j)
            while (j > 0) { selMtf(j) = selMtf(j - 1); j -= 1 }
            selMtf(0) = v
            selectors(s) = v
            s += 1
          }
          // per-group delta-coded lengths
          val tables = new Array[Huff](nGroups)
          var t = 0
          while (t < nGroups) {
            val lens = new Array[Int](alphaSize)
            var cur = r.readBits(5)
            var a = 0
            while (a < alphaSize) {
              var loop = true
              while (loop) {
                if (cur < 1 || cur > 20) throw Malformed
                if (r.readBit() == 0) loop = false
                else cur += (if (r.readBit() == 0) 1 else -1)
              }
              lens(a) = cur
              a += 1
            }
            tables(t) = new Huff(lens, 20)
            t += 1
          }
          // symbol stream: RLE2 + MTF decode straight to the BWT string
          val eob = alphaSize - 1
          val mtf = seqToUnseq.clone()
          // grow toward the level limit instead of pre-zeroing 900 KB
          // per block (corpus-scale GC discipline)
          var bwtBuf = new Array[Byte](math.min(limit, 8192))
          var bn = 0
          def ensure(extra: Long): Unit = {
            if (bn + extra > limit) throw Malformed
            if (bn + extra > bwtBuf.length) {
              var cap = bwtBuf.length.toLong
              while (cap < bn + extra) cap <<= 1
              bwtBuf = java.util.Arrays.copyOf(bwtBuf,
                math.min(cap, limit.toLong).toInt)
            }
          }
          var groupPos = 0
          var selIdx = -1
          var table: Huff = null
          var zRun = 0L
          var zPow = 0
          def flushRun(): Unit = {
            if (zRun > 0) {
              ensure(zRun)
              val ch = mtf(0).toByte
              var k = 0L
              while (k < zRun) { bwtBuf(bn) = ch; bn += 1; k += 1 }
              zRun = 0
              zPow = 0
            }
          }
          var eobSeen = false
          while (!eobSeen) {
            if (groupPos == 0) {
              selIdx += 1
              if (selIdx >= nSelectors) throw Malformed
              table = tables(selectors(selIdx))
              groupPos = 50
            }
            groupPos -= 1
            val sym = table.decode(r)
            if (sym == eob) { flushRun(); eobSeen = true }
            else if (sym <= 1) { // RUNA / RUNB
              zRun += (sym + 1).toLong << zPow
              zPow += 1
              if (zRun > limit) throw Malformed
            } else {
              flushRun()
              ensure(1)
              var j = sym - 1 // MTF index
              val v = mtf(j)
              while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
              mtf(0) = v
              bwtBuf(bn) = v.toByte
              bn += 1
            }
          }
          if (bn == 0) throw Malformed
          val plain = rle1Decode(
            unBwt(java.util.Arrays.copyOf(bwtBuf, bn), origPtr))
          if (blockCrc(plain, 0, plain.length) != declaredCrc) throw Malformed
          out.write(plain)
          if (out.size() > MAX_BYTES) throw Malformed
          combined = ((combined << 1) | (combined >>> 31)) ^ declaredCrc
          nBlocks += 1
        } else throw Malformed
      }
      val declaredCombined = r.readBits(32)
      if (declaredCombined != combined) throw Malformed
      if (!r.atPaddedEnd) throw Malformed // trailing garbage
      Some((out.toByteArray, nBlocks))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  // -------------------------------------------------------------- encode

  /** Encode content as one .bz2 stream (level 9), cutting CONTENT into
    * blocks every `blockCut` bytes — legal (the encoder chooses block
    * boundaries) and oracle-replayable. Returns (bytes, bitLen) so the
    * damage constructor can address the combined CRC exactly. */
  private[graft] def encodeWithBitLen(content: Array[Byte],
                                      blockCut: Int): (Array[Byte], Long) = {
    val w = new MsbWriter
    w.add('B', 8); w.add('Z', 8); w.add('h', 8); w.add('9', 8)
    var combined = 0
    var p = 0
    while (p < content.length) {
      val len = math.min(blockCut, content.length - p)
      combined = ((combined << 1) | (combined >>> 31)) ^
        encodeBlock(w, content, p, len)
      p += len
    }
    w.add(FOOTER_MAGIC, 48)
    w.add(combined.toLong & 0xFFFFFFFFL, 32)
    val bits = w.bitLen
    (w.finish(), bits)
  }

  private[graft] def encode(content: Array[Byte], blockCut: Int): Array[Byte] =
    encodeWithBitLen(content, blockCut)._1

  /** One block: RLE1 → BWT → MTF+RLE2 → two identical Huffman tables
    * (nGroups=2 is the format's minimum; both carry the same complete
    * canonical code so every selector schedule is valid). Returns the
    * block CRC. */
  private def encodeBlock(w: MsbWriter, src: Array[Byte], off: Int,
                          len: Int): Int = {
    val crc = blockCrc(src, off, len)
    val rle = rle1Encode(src, off, len)
    val (last, origPtr) = bwt(rle)
    // used-symbol map
    val used = new Array[Boolean](256)
    last.foreach(b => used(b & 0xFF) = true)
    val seqToUnseq = (0 until 256).filter(used).toArray
    val nUsed = seqToUnseq.length
    val alphaSize = nUsed + 2
    val eob = alphaSize - 1
    // MTF + RLE2
    val mtf = seqToUnseq.clone()
    val symsB = Vector.newBuilder[Int]
    var zRun = 0L
    def flushRun(): Unit = {
      var n = zRun
      while (n > 0) {
        val d = if ((n & 1) == 1) 1 else 2
        symsB += (d - 1) // RUNA=0, RUNB=1
        n = (n - d) >> 1
      }
      zRun = 0
    }
    var i = 0
    while (i < last.length) {
      val v = last(i) & 0xFF
      var j = 0
      while (mtf(j) != v) j += 1
      if (j == 0) zRun += 1
      else {
        flushRun()
        symsB += (j + 1)
        while (j > 0) { mtf(j) = mtf(j - 1); j -= 1 }
        mtf(0) = v
      }
      i += 1
    }
    flushRun()
    symsB += eob
    val syms = symsB.result()
    // one complete canonical table over the whole alphabet (freq-0
    // symbols get weight 1, the reference encoder's smoothing), used
    // for both groups
    val freq = new Array[Long](alphaSize)
    syms.foreach(freq(_) += 1)
    var a = 0
    while (a < alphaSize) { if (freq(a) == 0) freq(a) = 1; a += 1 }
    val lens = DeflateCodec.huffLengths(freq, 17)
    val codes = DeflateCodec.canonCodes(lens, 17)
    val nGroups = 2
    val nSelectors = (syms.length + 49) / 50
    // emit
    w.add(BLOCK_MAGIC, 48)
    w.add(crc.toLong & 0xFFFFFFFFL, 32)
    w.add(0, 1) // randomized: no
    w.add(origPtr.toLong, 24)
    var ranges = 0
    var g = 0
    while (g < 16) {
      var j = 0
      var any = false
      while (j < 16) { if (used(g * 16 + j)) any = true; j += 1 }
      if (any) ranges |= 1 << (15 - g)
      g += 1
    }
    w.add(ranges.toLong, 16)
    g = 0
    while (g < 16) {
      if (((ranges >> (15 - g)) & 1) == 1) {
        var bits = 0
        var j = 0
        while (j < 16) {
          if (used(g * 16 + j)) bits |= 1 << (15 - j)
          j += 1
        }
        w.add(bits.toLong, 16)
      }
      g += 1
    }
    w.add(nGroups.toLong, 3)
    w.add(nSelectors.toLong, 15)
    var s = 0
    while (s < nSelectors) { w.add(0, 1); s += 1 } // all select table 0 (unary "0")
    var t = 0
    while (t < nGroups) {
      var cur = lens(0)
      w.add(cur.toLong, 5)
      a = 0
      while (a < alphaSize) {
        while (cur < lens(a)) { w.add(2, 2); cur += 1 } // 10 = increment
        while (cur > lens(a)) { w.add(3, 2); cur -= 1 } // 11 = decrement
        w.add(0, 1) // done with this symbol
        a += 1
      }
      t += 1
    }
    syms.foreach(sm => w.add(codes(sm).toLong, lens(sm)))
    crc
  }
}

/** In-plan synthesizer + gate for d125 — the Lz4Sim/DeflateSim shape. */
object Bzip2Sim {

  private[graft] def blockCut(docId: Long): Int = (500 + docId % 400).toInt

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val (clean, bitLen) =
      Bzip2Codec.encodeWithBitLen(text.getBytes("UTF-8"), blockCut(docId))
    (docId % 7) match {
      case 0 => // truncation: loses the combined CRC (and footer bits)
        java.util.Arrays.copyOf(clean, clean.length - 5)
      case 3 =>
        // the deprecated RANDOMIZED legacy flag — a fixed bit position:
        // 32 header bits + 48 block magic + 32 block CRC = bit 112
        // (byte 14, MSB); a strict modern decoder must reject it
        val d = clean.clone()
        d(14) = (d(14) | 0x80).toByte
        d
      case 5 =>
        // combined-CRC flip (the verdict's ask): the stream's FINAL
        // integrity field — the last 32 pre-padding bits; flip the
        // 4th-from-last so padding can never mask it
        val d = clean.clone()
        val bitPos = bitLen - 4
        d((bitPos / 8).toInt) =
          (d((bitPos / 8).toInt) ^ (1 << (7 - (bitPos % 8)).toInt)).toByte
        d
      case _ => clean
    }
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_blocks", LongType),
    StructField("n_bytes", LongType),
    StructField("n_lines", LongType),
    StructField("roundtrip_ok", BooleanType)))

  /** Batched strict decode → per-doc stats with quarantine; the WALKED
    * block count is compared against the oracle's closed form. */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            Bzip2Codec.decode(payloadFor(id, text)) match {
              case Some((content, nBlocks)) =>
                var nLines = 1L
                var j = 0
                while (j < content.length) {
                  if (content(j) == '\n') nLines += 1
                  j += 1
                }
                Row(id, "ok", nBlocks.toLong, content.length.toLong, nLines,
                  java.lang.Boolean.valueOf(
                    java.util.Arrays.equals(content, text.getBytes("UTF-8"))))
              case None =>
                Row(id, "quarantined", null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
