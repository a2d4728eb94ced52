package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Zstandard frame + block codec for the d117 gate — the compression
  * format modern LLM corpora actually ship in (.jsonl.zst —
  * RedPajama/Dolma-class releases): the FRAME format per RFC 8878
  * (magic, frame-header descriptor, FCS, length-prefixed blocks,
  * whole-content xxHash64 checksum) wrapping compressed BLOCKS whose
  * entropy layer is the one family the codec sweep hadn't built —
  * FSE/tANS (table-description read, state-spread construction, the
  * three interleaved LL/OF/ML sequence streams decoded off a backward
  * bitstream) and huff0 (canonical weight-ranked Huffman, 1- and
  * 4-stream, FSE-compressed OR direct weights, treeless repeats).
  *
  * BOTH directions are implemented HERE from RFC 8878: the decoder
  * covers raw/RLE/compressed blocks, all four literals types, all
  * four sequence-table modes (predefined / RLE / FSE-compressed /
  * repeat), and the 3-entry repeat-offset history with its
  * litLen==0 special cases; the encoder emits single-segment frames
  * with greedy-matched sequences under the RFC's PREDEFINED FSE
  * distributions (real tANS encoding — reverse-order state chaining
  * over the same decode tables) and huff0 direct-weight literals.
  * The xxHash64 primitive comes from lz4-java on the Spark classpath
  * (the d115 xxHash32 precedent: the checksum is the borrowed
  * primitive, the codec is ours); zstd-jni — also on the public
  * Spark classpath — is used ONLY as the independent interop
  * implementation, pinned BOTH directions in MediaDecodePropertySpec.
  *
  * Scope (the d98 discipline): single zstd frame, no dictionary
  * (Dictionary_ID_flag must be 0), content checksum REQUIRED and
  * verified, FCS (when present) verified against the decoded length,
  * reserved AND unused descriptor bits rejected — the unused bit is
  * the one field the checksum cannot cover (the tar byte-155 lesson:
  * fields excluded from their own integrity computation need
  * explicit grammar checks), so with it pinned to 0 every single bit
  * flip in one of our single-segment frames quarantines (property-
  * gated). Anything else — skippable frames, dictionaries, trailing
  * bytes — QUARANTINES rather than crashes.
  */
object ZstdCodec {

  private val xxf = net.jpountz.xxhash.XXHashFactory.fastestJavaInstance()

  private[graft] def xxh64low32(b: Array[Byte], len: Int): Long =
    xxf.hash64().hash(b, 0, len, 0L) & 0xFFFFFFFFL

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ---- bitstreams ---------------------------------------------------

  /** RFC 8878 backward bitstream: written LSB-first little-endian, a
    * final 1-sentinel marks the top; the reader starts at the top and
    * consumes downward. `peek` past the start zero-fills (legal at
    * stream end — the last Huffman code may be shorter than the
    * lookahead); `consume` past the start marks overflow (the FSE
    * weight decoder's termination signal; fatal everywhere else). */
  private[operators] final class BackBits(buf: Array[Byte], start: Int, end: Int) {
    if (end <= start) throw Malformed
    private val lastByte = buf(end - 1) & 0xFF
    if (lastByte == 0) throw Malformed // missing sentinel
    private var remaining: Int =
      (end - start - 1) * 8 + (31 - Integer.numberOfLeadingZeros(lastByte))
    var overflowed: Boolean = false

    /** Top `n` (0..31) bits without consuming, zero-filled below start. */
    def peek(n: Int): Int = {
      if (n == 0) return 0
      val lo = remaining - n
      var acc = 0L
      val byteLo = lo >> 3 // arithmetic: floor for negative lo
      val byteHi = (lo + n - 1) >> 3
      var bi = math.max(byteLo, 0)
      while (bi <= byteHi) {
        acc |= (buf(start + bi) & 0xFFL) << ((bi - byteLo) << 3)
        bi += 1
      }
      ((acc >>> (lo - (byteLo << 3))) & ((1L << n) - 1)).toInt
    }

    def consume(n: Int): Unit = {
      remaining -= n
      if (remaining < 0) overflowed = true
    }

    def read(n: Int): Int = { val v = peek(n); consume(n); v }

    def bitsLeft: Int = remaining

    /** Exactly consumed, never over-read — the strict end check. */
    def exhaustedOk: Boolean = remaining == 0 && !overflowed
  }

  /** Forward LSB-first reader for FSE table descriptions (which end
    * byte-aligned). */
  private final class FwdBits(buf: Array[Byte], start: Int, val end: Int) {
    private var bit = 0
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val bp = bit + i
        val idx = start + (bp >> 3)
        if (idx >= end) throw Malformed
        v |= ((buf(idx) >> (bp & 7)) & 1) << i
        i += 1
      }
      bit += n
      v
    }
    def peek(n: Int): Int = { val b0 = bit; val v = read(n); bit = b0; v }
    def skip(n: Int): Unit = bit += n
    /** Byte offset just past the (byte-aligned) description. */
    def byteAligned: Int = start + ((bit + 7) >> 3)
  }

  // ---- FSE ----------------------------------------------------------

  /** FSE decode table: state u emits `sym(u)`, next state =
    * `base(u) + readBits(nb(u))`. Built from normalized counts with
    * the RFC's spread step; the less-than-one (-1) symbols take the
    * single top cells. Doubles as the ENCODE table: for a symbol, the
    * `[base, base+2^nb)` intervals of its cells partition the state
    * space, so encoding = pick the covering cell, emit the offset. */
  private[operators] final class FseTable(val accLog: Int, counts: Array[Int]) {
    val size: Int = 1 << accLog
    val sym = new Array[Int](size)
    val nb = new Array[Int](size)
    val base = new Array[Int](size)
    locally {
      var highThreshold = size - 1
      // less-than-one symbols: one cell each from the top, symbol order
      var s = 0
      while (s < counts.length) {
        if (counts(s) == -1) { sym(highThreshold) = s; highThreshold -= 1 }
        s += 1
      }
      // spread the positive-probability symbols
      val step = (size >> 1) + (size >> 3) + 3
      val mask = size - 1
      var pos = 0
      s = 0
      while (s < counts.length) {
        var i = 0
        while (i < counts(s)) {
          sym(pos) = s
          pos = (pos + step) & mask
          while (pos > highThreshold) pos = (pos + step) & mask
          i += 1
        }
        s += 1
      }
      if (pos != 0) throw Malformed // counts didn't fill the table
      // per-cell transition: nextState counter starts at the count
      val nextState = new Array[Int](counts.length)
      s = 0
      while (s < counts.length) {
        nextState(s) = if (counts(s) == -1) 1 else counts(s)
        s += 1
      }
      var u = 0
      while (u < size) {
        val sy = sym(u)
        val ns = nextState(sy); nextState(sy) += 1
        val nbits = accLog - (31 - Integer.numberOfLeadingZeros(ns))
        nb(u) = nbits
        base(u) = (ns << nbits) - size
        u += 1
      }
    }
  }

  /** Single-symbol (RLE-mode) table: accLog 0, state pinned at 0. */
  private[operators] def rleTable(symbol: Int): FseTable = {
    val t = new FseTable(0, Array(1))
    t.sym(0) = symbol
    t
  }

  /** Read an FSE table description (forward bitstream, byte-aligned
    * end) → (table, bytesConsumed). */
  private[operators] def readFseTable(buf: Array[Byte], start: Int, end: Int,
                                      maxAccLog: Int, maxSym: Int): (FseTable, Int) = {
    val in = new FwdBits(buf, start, end)
    val accLog = in.read(4) + 5
    if (accLog > maxAccLog) throw Malformed
    val tableSize = 1 << accLog
    var remaining = tableSize + 1
    val counts = new scala.collection.mutable.ArrayBuffer[Int]()
    while (remaining > 1) {
      if (counts.length > maxSym) throw Malformed
      val nbBits = 32 - Integer.numberOfLeadingZeros(remaining) // highbit+1
      val peeked = in.peek(nbBits)
      val half = 1 << (nbBits - 1)
      val max = (1 << nbBits) - 1 - remaining // values below read one bit less
      val low = peeked & (half - 1)
      val value =
        if (low < max) { in.skip(nbBits - 1); low }
        else {
          in.skip(nbBits)
          if (peeked >= half) peeked - max else peeked
        }
      val proba = value - 1 // -1 = less-than-one
      remaining -= (if (proba < 0) 1 else proba)
      if (remaining < 1) throw Malformed
      counts += proba
      if (proba == 0) {
        var rep = in.read(2)
        var total = rep
        while (rep == 3) { rep = in.read(2); total += rep }
        var i = 0
        while (i < total) {
          if (counts.length > maxSym) throw Malformed
          counts += 0; i += 1
        }
      }
    }
    (new FseTable(accLog, counts.toArray), in.byteAligned - start)
  }

  // predefined distributions, RFC 8878 §3.1.1.3.2.2.1
  private val LL_DEFAULT = Array(4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val ML_DEFAULT = Array(1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OF_DEFAULT = Array(1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)
  private[operators] lazy val LL_TABLE = new FseTable(6, LL_DEFAULT)
  private[operators] lazy val ML_TABLE = new FseTable(6, ML_DEFAULT)
  private[operators] lazy val OF_TABLE = new FseTable(5, OF_DEFAULT)

  // code → (baseline, extra bits), RFC 8878 §3.1.1.3.2.1.1
  private[operators] val LL_BASE = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11,
    12, 13, 14, 15, 16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512,
    1024, 2048, 4096, 8192, 16384, 32768, 65536)
  private[operators] val LL_XBITS = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private[operators] val ML_BASE = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13,
    14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539)
  private[operators] val ML_XBITS = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1,
    2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // ---- huff0 --------------------------------------------------------

  /** Huffman decode table: `tableLog`-bit lookahead → (symbol,
    * nbBits), weight-rank layout (ascending weight, natural symbol
    * order within a weight). `weights` EXCLUDES the implied last
    * symbol; its weight completes the Kraft sum to a power of 2. */
  private[operators] final class HuffTable(explicit: Array[Int]) {
    val weights: Array[Int] = {
      var total = 0L
      var i = 0
      while (i < explicit.length) {
        val w = explicit(i)
        if (w < 0 || w > 11) throw Malformed
        if (w > 0) total += (1L << (w - 1))
        i += 1
      }
      if (total == 0) throw Malformed
      val maxBits = 64 - java.lang.Long.numberOfLeadingZeros(total) // next pow2 exponent
      val left = (1L << maxBits) - total
      if (java.lang.Long.bitCount(left) != 1) throw Malformed
      val lastW = 64 - java.lang.Long.numberOfLeadingZeros(left) // highbit+1
      if (lastW < 1 || maxBits > 11) throw Malformed
      explicit :+ lastW.toInt
    }
    val tableLog: Int = {
      var total = 0L
      weights.foreach(w => if (w > 0) total += (1L << (w - 1)))
      63 - java.lang.Long.numberOfLeadingZeros(total)
    }
    val sym = new Array[Byte](1 << tableLog)
    val nb = new Array[Byte](1 << tableLog)
    /** cellStart(s): first table cell of symbol s (for the encoder). */
    val cellStart = new Array[Int](weights.length)
    locally {
      val rankCount = new Array[Int](tableLog + 2)
      weights.foreach(w => if (w > 0) rankCount(w) += 1)
      val rankStart = new Array[Int](tableLog + 2)
      var next = 0
      var w = 1
      while (w <= tableLog + 1) {
        rankStart(w) = next
        next += rankCount(w) << (w - 1)
        w += 1
      }
      if (next != (1 << tableLog)) throw Malformed
      var s = 0
      while (s < weights.length) {
        val wt = weights(s)
        if (wt > 0) {
          val len = 1 << (wt - 1)
          val st = rankStart(wt)
          cellStart(s) = st
          var u = st
          while (u < st + len) {
            sym(u) = s.toByte
            nb(u) = (tableLog + 1 - wt).toByte
            u += 1
          }
          rankStart(wt) += len
        } else cellStart(s) = -1
        s += 1
      }
    }
  }

  /** Huffman tree description → (table, bytesConsumed). headerByte
    * ≥ 128: direct 4-bit weights; < 128: FSE-compressed weights
    * (accuracy ≤ 6, two interleaved states, overflow-terminated). */
  private[operators] def readHuffTable(buf: Array[Byte], start: Int, end: Int): (HuffTable, Int) = {
    if (start >= end) throw Malformed
    val hb = buf(start) & 0xFF
    if (hb >= 128) {
      val n = hb - 127 // number of explicit weights
      val bytes = (n + 1) / 2
      if (start + 1 + bytes > end) throw Malformed
      val ws = new Array[Int](n)
      var i = 0
      while (i < n) {
        val b = buf(start + 1 + i / 2) & 0xFF
        ws(i) = if (i % 2 == 0) b >> 4 else b & 0xF
        i += 1
      }
      (new HuffTable(ws), 1 + bytes)
    } else {
      val compSize = hb
      if (start + 1 + compSize > end) throw Malformed
      val (ft, tdBytes) = readFseTable(buf, start + 1, start + 1 + compSize,
        maxAccLog = 6, maxSym = 255)
      val bits = new BackBits(buf, start + 1 + tdBytes, start + 1 + compSize)
      var st1 = bits.read(ft.accLog)
      var st2 = bits.read(ft.accLog)
      if (bits.overflowed) throw Malformed
      val ws = new scala.collection.mutable.ArrayBuffer[Int]()
      var done = false
      while (!done) {
        if (ws.length >= 254) throw Malformed
        ws += ft.sym(st1); st1 = ft.base(st1) + bits.read(ft.nb(st1))
        if (bits.overflowed) { ws += ft.sym(st2); done = true }
        else {
          ws += ft.sym(st2); st2 = ft.base(st2) + bits.read(ft.nb(st2))
          if (bits.overflowed) { ws += ft.sym(st1); done = true }
        }
      }
      (new HuffTable(ws.toArray), 1 + compSize)
    }
  }

  /** Decode one huff0 stream into out[outPos, outPos+count). */
  private def huffDecodeStream(table: HuffTable, buf: Array[Byte], start: Int,
                               end: Int, out: Array[Byte], outPos: Int,
                               count: Int): Unit = {
    val bits = new BackBits(buf, start, end)
    val tl = table.tableLog
    var i = 0
    while (i < count) {
      val v = bits.peek(tl)
      out(outPos + i) = table.sym(v)
      bits.consume(table.nb(v))
      i += 1
    }
    if (!bits.exhaustedOk) throw Malformed
  }

  // ---- compressed-block decode ---------------------------------------

  /** Per-frame entropy context for Treeless/Repeat modes. */
  private final class FrameCtx {
    var huff: HuffTable = null
    var llT: FseTable = null
    var ofT: FseTable = null
    var mlT: FseTable = null
    val rep: Array[Int] = Array(1, 4, 8)
  }

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  /** Decode the literals section → (literals, bytesConsumed). */
  private def decodeLiterals(b: Array[Byte], start: Int, end: Int,
                             ctx: FrameCtx, maxRegen: Int): (Array[Byte], Int) = {
    if (start >= end) throw Malformed
    val b0 = b(start) & 0xFF
    val litType = b0 & 3
    val sizeFmt = (b0 >> 2) & 3
    if (litType <= 1) { // Raw / RLE
      val (regen, hdr) = sizeFmt match {
        case 0 | 2 => (b0 >> 3, 1)
        case 1 =>
          if (start + 2 > end) throw Malformed
          ((b0 >> 4) | ((b(start + 1) & 0xFF) << 4), 2)
        case _ =>
          if (start + 3 > end) throw Malformed
          ((b0 >> 4) | ((b(start + 1) & 0xFF) << 4) | ((b(start + 2) & 0xFF) << 12), 3)
      }
      if (regen > maxRegen) throw Malformed
      if (litType == 0) {
        if (start + hdr + regen > end) throw Malformed
        (java.util.Arrays.copyOfRange(b, start + hdr, start + hdr + regen),
          hdr + regen)
      } else {
        if (start + hdr + 1 > end) throw Malformed
        val out = new Array[Byte](regen)
        java.util.Arrays.fill(out, b(start + hdr))
        (out, hdr + 1)
      }
    } else { // Compressed / Treeless
      val (regen, comp, hdr, fourStreams) = sizeFmt match {
        case 0 =>
          if (start + 3 > end) throw Malformed
          val h = b0 | ((b(start + 1) & 0xFF) << 8) | ((b(start + 2) & 0xFF) << 16)
          ((h >> 4) & 0x3FF, (h >> 14) & 0x3FF, 3, false)
        case 1 =>
          if (start + 3 > end) throw Malformed
          val h = b0 | ((b(start + 1) & 0xFF) << 8) | ((b(start + 2) & 0xFF) << 16)
          ((h >> 4) & 0x3FF, (h >> 14) & 0x3FF, 3, true)
        case 2 =>
          if (start + 4 > end) throw Malformed
          val h = b0 | ((b(start + 1) & 0xFF) << 8) |
            ((b(start + 2) & 0xFF) << 16) | ((b(start + 3) & 0xFF) << 24)
          ((h >> 4) & 0x3FFF, (h >>> 18) & 0x3FFF, 4, true)
        case _ =>
          if (start + 5 > end) throw Malformed
          val h = (b0 | ((b(start + 1) & 0xFFL) << 8) |
            ((b(start + 2) & 0xFFL) << 16) | ((b(start + 3) & 0xFFL) << 24) |
            ((b(start + 4) & 0xFFL) << 32))
          (((h >> 4) & 0x3FFFF).toInt, ((h >> 22) & 0x3FFFF).toInt, 5, true)
      }
      if (regen > maxRegen) throw Malformed
      if (start + hdr + comp > end) throw Malformed
      var p = start + hdr
      val streamsEnd = start + hdr + comp
      val table =
        if (litType == 2) {
          val (t, used) = readHuffTable(b, p, streamsEnd)
          ctx.huff = t
          p += used
          t
        } else {
          if (ctx.huff == null) throw Malformed // treeless without a tree
          ctx.huff
        }
      val out = new Array[Byte](regen)
      if (!fourStreams) {
        if (p >= streamsEnd) throw Malformed
        huffDecodeStream(table, b, p, streamsEnd, out, 0, regen)
      } else {
        if (p + 6 > streamsEnd) throw Malformed
        val s1 = u16le(b, p); val s2 = u16le(b, p + 2); val s3 = u16le(b, p + 4)
        p += 6
        val s4 = streamsEnd - p - s1 - s2 - s3
        if (s4 <= 0) throw Malformed
        val r123 = (regen + 3) / 4
        val r4 = regen - 3 * r123
        if (r4 < 0) throw Malformed
        huffDecodeStream(table, b, p, p + s1, out, 0, r123)
        huffDecodeStream(table, b, p + s1, p + s1 + s2, out, r123, r123)
        huffDecodeStream(table, b, p + s1 + s2, p + s1 + s2 + s3, out, 2 * r123, r123)
        huffDecodeStream(table, b, p + s1 + s2 + s3, streamsEnd, out, 3 * r123, r4)
      }
      (out, hdr + comp)
    }
  }

  /** Resolve one sequence-table mode; returns the decode table. */
  private def seqTable(mode: Int, b: Array[Byte], pRef: Array[Int], end: Int,
                       default: FseTable, prev: FseTable, maxAccLog: Int,
                       maxSym: Int): FseTable = mode match {
    case 0 => default
    case 1 =>
      if (pRef(0) >= end) throw Malformed
      val s = b(pRef(0)) & 0xFF; pRef(0) += 1
      if (s > maxSym) throw Malformed
      rleTable(s)
    case 2 =>
      val (t, used) = readFseTable(b, pRef(0), end, maxAccLog, maxSym)
      pRef(0) += used
      t
    case _ =>
      if (prev == null) throw Malformed // repeat without a previous table
      prev
  }

  /** Decode one compressed block into `out` (which already holds the
    * frame's prior content — the match window). */
  private def decodeCompressedBlock(b: Array[Byte], start: Int, end: Int,
                                    ctx: FrameCtx,
                                    window: Array[Byte], winLen: Int,
                                    maxRegen: Int): Array[Byte] = {
    val (lits, litBytes) = decodeLiterals(b, start, end, ctx, maxRegen)
    var p = start + litBytes
    if (p >= end) throw Malformed
    // Number_of_Sequences varint
    val s0 = b(p) & 0xFF; p += 1
    val nbSeq =
      if (s0 < 128) s0
      else if (s0 < 255) {
        if (p >= end) throw Malformed
        val v = ((s0 - 128) << 8) | (b(p) & 0xFF); p += 1; v
      } else {
        if (p + 2 > end) throw Malformed
        val v = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8); p += 2; v + 0x7F00
      }
    if (nbSeq == 0) {
      if (p != end) throw Malformed
      if (lits.length > maxRegen) throw Malformed
      return lits
    }
    if (p >= end) throw Malformed
    val modes = b(p) & 0xFF; p += 1
    if ((modes & 3) != 0) throw Malformed // reserved bits
    val pRef = Array(p)
    val llT = seqTable((modes >> 6) & 3, b, pRef, end, LL_TABLE, ctx.llT, 9, 35)
    val ofT = seqTable((modes >> 4) & 3, b, pRef, end, OF_TABLE, ctx.ofT, 8, 31)
    val mlT = seqTable((modes >> 2) & 3, b, pRef, end, ML_TABLE, ctx.mlT, 9, 52)
    ctx.llT = llT; ctx.ofT = ofT; ctx.mlT = mlT
    p = pRef(0)
    if (p >= end) throw Malformed
    val bits = new BackBits(b, p, end)
    var llS = bits.read(llT.accLog)
    var ofS = bits.read(ofT.accLog)
    var mlS = bits.read(mlT.accLog)
    if (bits.overflowed) throw Malformed
    val blockOut = new Array[Byte](maxRegen)
    var o = 0
    var litPos = 0
    val rep = ctx.rep
    var i = 0
    while (i < nbSeq) {
      val ofCode = ofT.sym(ofS)
      if (ofCode > 31) throw Malformed
      val ofValue =
        if (ofCode == 0) 1L
        else (1L << ofCode) + (bits.read(ofCode).toLong & 0xFFFFFFFFL)
      val mlCode = mlT.sym(mlS)
      if (mlCode > 52) throw Malformed
      val matchLen = ML_BASE(mlCode) + bits.read(ML_XBITS(mlCode))
      val llCode = llT.sym(llS)
      if (llCode > 35) throw Malformed
      val litLen = LL_BASE(llCode) + bits.read(LL_XBITS(llCode))
      // repeat-offset resolution (RFC 8878 §3.1.1.5)
      val offset: Int =
        if (ofValue > 3) {
          // Bound BEFORE narrowing: with an FSE-coded offset table ofCode can
          // reach 31, so ofValue-3 can exceed Int.MaxValue; a naive .toInt
          // would wrap negative and slip past the window check below.
          val offL = ofValue - 3L
          if (offL > winLen.toLong + maxRegen.toLong) throw Malformed
          val off = offL.toInt
          rep(2) = rep(1); rep(1) = rep(0); rep(0) = off
          off
        } else {
          val idx = ofValue.toInt - 1 + (if (litLen == 0) 1 else 0)
          if (idx == 0) { if (rep(0) <= 0) throw Malformed; rep(0) }
          else {
            val off = if (idx == 3) rep(0) - 1 else rep(idx)
            if (off <= 0) throw Malformed
            if (idx != 1) rep(2) = rep(1)
            rep(1) = rep(0); rep(0) = off
            off
          }
        }
      if (i < nbSeq - 1) {
        llS = llT.base(llS) + bits.read(llT.nb(llS))
        mlS = mlT.base(mlS) + bits.read(mlT.nb(mlS))
        ofS = ofT.base(ofS) + bits.read(ofT.nb(ofS))
      }
      // execute: literals then match copy (window = prior frame output)
      if (litPos + litLen > lits.length || o + litLen + matchLen > maxRegen)
        throw Malformed
      System.arraycopy(lits, litPos, blockOut, o, litLen)
      litPos += litLen; o += litLen
      if (offset > winLen + o) throw Malformed
      var j = 0
      while (j < matchLen) {
        val src = o - offset
        blockOut(o) = if (src >= 0) blockOut(src) else window(winLen + src)
        o += 1; j += 1
      }
      i += 1
    }
    if (!bits.exhaustedOk) throw Malformed
    val lastLits = lits.length - litPos
    if (o + lastLits > maxRegen) throw Malformed
    System.arraycopy(lits, litPos, blockOut, o, lastLits)
    o += lastLits
    java.util.Arrays.copyOf(blockOut, o)
  }

  // ---- frame decode ---------------------------------------------------

  private val MAGIC = 0xFD2FB528L
  private val MAX_CONTENT = 1 << 26 // 64 MB guard for the local gates
  private val BLOCK_CEIL = 128 * 1024

  /** A zstd dictionary (RFC 8878 §5): either the STRUCTURED format
    * (magic 0xEC30A437, dictID, entropy tables seeding Treeless/Repeat
    * modes, three replacement repcodes, then content) or a RAW-CONTENT
    * dictionary (any other bytes; spec-legal — just a match-history
    * prefix, id assigned by the registry that distributes it). */
  private[graft] final case class ZDict(id: Long, content: Array[Byte],
      huff: HuffTable, ofT: FseTable, mlT: FseTable, llT: FseTable,
      reps: Array[Int])

  private val DICT_MAGIC = 0xEC30A437L

  /** Raw-content dictionary with a registry-assigned id. */
  private[graft] def rawDict(content: Array[Byte], id: Long = 0L): ZDict =
    ZDict(id, content.clone(), null, null, null, null, Array(1, 4, 8))

  /** Strict parse of a STRUCTURED dictionary; bytes without the magic
    * are a raw-content dictionary (id 0). None quarantines. */
  private[graft] def parseDictionary(b: Array[Byte]): Option[ZDict] =
    try {
      def u32(i: Int): Long = {
        if (i + 4 > b.length) throw Malformed
        (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
          ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
      }
      if (b.length < 8 || u32(0) != DICT_MAGIC) Some(rawDict(b))
      else {
        val id = u32(4)
        if (id == 0) throw Malformed // structured dicts carry a real id
        var p = 8
        val (huff, hUsed) = readHuffTable(b, p, b.length)
        p += hUsed
        // FSE tables in the spec's order: offsets, match lengths,
        // literals lengths — with the block-decode caps
        val (of, u1) = readFseTable(b, p, b.length, 8, 31); p += u1
        val (ml, u2) = readFseTable(b, p, b.length, 9, 52); p += u2
        val (ll, u3) = readFseTable(b, p, b.length, 9, 35); p += u3
        if (p + 12 > b.length) throw Malformed
        val reps = Array(u32(p).toInt, u32(p + 4).toInt, u32(p + 8).toInt)
        p += 12
        val content = java.util.Arrays.copyOfRange(b, p, b.length)
        // each replacement repcode must land inside the content
        reps.foreach(r => if (r <= 0 || r > content.length) throw Malformed)
        Some(ZDict(id, content, huff, of, ml, ll, reps))
      }
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  /** One frame starting at `start` → (content, positionAfterFrame);
    * throws Malformed on anything malformed or out of scope. With a
    * `dict`, the dictionary seeds the entropy context, repcodes and
    * match window (RFC 8878 §5); a frame-header dictID must then
    * match the dictionary's. */
  private def frameAt(b: Array[Byte], start: Int,
                      requireChecksum: Boolean = true,
                      dict: ZDict = null): (Array[Byte], Int) = {
    def u32(i: Int): Long =
      (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
        ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
    locally {
      if (b.length < start + 9 || u32(start) != MAGIC) throw Malformed
      val fhd = b(start + 4) & 0xFF
      val fcsFlag = fhd >> 6
      val single = (fhd & 0x20) != 0
      if ((fhd & 0x10) != 0) throw Malformed // unused bit: rejected (see doc)
      if ((fhd & 0x08) != 0) throw Malformed // reserved bit
      // the gate surface REQUIRES the content checksum (d117 scope);
      // the loose surface (d126 parquet pages — parquet-mr writes
      // checksum-less frames) accepts its absence, spec-legal per
      // RFC 8878 §3.1.1
      val hasChecksum = (fhd & 0x04) != 0
      if (requireChecksum && !hasChecksum) throw Malformed
      val didFlag = fhd & 0x03
      // a frame that names a dictionary we don't hold is undecodable
      if (didFlag != 0 && dict == null) throw Malformed
      var p = start + 5
      var windowSize = 0L
      if (!single) {
        val wd = b(p) & 0xFF; p += 1
        val base = 1L << (10 + (wd >> 3))
        windowSize = base + (base / 8) * (wd & 7)
        if (windowSize > MAX_CONTENT) throw Malformed
      }
      if (didFlag != 0) {
        val nb = didFlag match { case 1 => 1; case 2 => 2; case _ => 4 }
        if (p + nb > b.length) throw Malformed
        var did = 0L
        var i = 0
        while (i < nb) { did |= (b(p + i) & 0xFFL) << (8 * i); i += 1 }
        p += nb
        // the id exists exactly so the wrong dictionary can't decode
        // plausible garbage: a mismatch quarantines
        if (did != dict.id) throw Malformed
      }
      val fcs: Long = fcsFlag match {
        case 0 =>
          if (single) { val v = b(p) & 0xFFL; p += 1; v } else -1L
        case 1 =>
          val v = (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8); p += 2; v + 256
        case 2 => val v = u32(p); p += 4; v
        case _ =>
          var v = 0L
          var i = 0
          while (i < 8) { v |= (b(p + i) & 0xFFL) << (8 * i); i += 1 }
          p += 8
          v
      }
      if (single) windowSize = fcs
      if (fcs > MAX_CONTENT) throw Malformed
      val blockMax = math.min(math.max(windowSize, 1L), BLOCK_CEIL.toLong).toInt
      val ctx = new FrameCtx
      val dictLen = if (dict == null) 0 else dict.content.length
      if (dict != null) {
        // the dictionary seeds the Treeless/Repeat entropy context and
        // the recent-offset history (RFC 8878 §5)
        ctx.huff = dict.huff
        ctx.llT = dict.llT; ctx.ofT = dict.ofT; ctx.mlT = dict.mlT
        ctx.rep(0) = dict.reps(0); ctx.rep(1) = dict.reps(1)
        ctx.rep(2) = dict.reps(2)
      }
      var window = new Array[Byte](
        dictLen + (if (fcs > 0) fcs.toInt else 1 << 12))
      if (dictLen > 0)
        System.arraycopy(dict.content, 0, window, 0, dictLen)
      var winLen = dictLen // match history = dict prefix + decoded content
      def append(chunk: Array[Byte], len: Int): Unit = {
        if (winLen + len > window.length)
          window = java.util.Arrays.copyOf(window,
            math.max(window.length * 2, winLen + len))
        System.arraycopy(chunk, 0, window, winLen, len)
        winLen += len
      }
      var last = false
      while (!last) {
        if (p + 3 > b.length) throw Malformed
        val bh = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) | ((b(p + 2) & 0xFF) << 16)
        p += 3
        last = (bh & 1) != 0
        val btype = (bh >> 1) & 3
        val bsize = bh >>> 3
        if (winLen + bsize > MAX_CONTENT) throw Malformed
        btype match {
          case 0 => // raw
            if (bsize > blockMax || p + bsize > b.length) throw Malformed
            append(java.util.Arrays.copyOfRange(b, p, p + bsize), bsize)
            p += bsize
          case 1 => // RLE: bsize = regenerated count, content 1 byte
            if (bsize > blockMax || p + 1 > b.length) throw Malformed
            val chunk = new Array[Byte](bsize)
            java.util.Arrays.fill(chunk, b(p))
            append(chunk, bsize)
            p += 1
          case 2 => // compressed
            if (bsize > blockMax || p + bsize > b.length || bsize == 0)
              throw Malformed
            val chunk = decodeCompressedBlock(b, p, p + bsize, ctx,
              window, winLen, blockMax)
            append(chunk, chunk.length)
            p += bsize
          case _ => throw Malformed // reserved block type
        }
      }
      val content = java.util.Arrays.copyOfRange(window, dictLen, winLen)
      if (fcs >= 0 && content.length != fcs) throw Malformed
      if (!hasChecksum) (content, p)
      else {
        if (p + 4 > b.length) throw Malformed
        if (u32(p) != xxh64low32(content, content.length)) throw Malformed
        (content, p + 4)
      }
    }
  }

  /** Single-frame decode ACCEPTING checksum-less frames (RFC 8878
    * makes the content checksum optional; parquet-mr's page codec
    * omits it) — the d126 surface. The d117 gate keeps [[decode]]'s
    * checksum-required scope. */
  private[operators] def decodeLoose(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val (content, end) = frameAt(b, 0, requireChecksum = false)
      if (end != b.length) None else Some(content)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** STRICT single-frame decode AGAINST A DICTIONARY (d143): the dict
    * seeds window/entropy/repcodes; a frame-header dictID must match.
    * `requireChecksum = false` is the interop surface (libzstd omits
    * the content checksum by default — the decodeLoose precedent). */
  private[graft] def decodeWithDict(b: Array[Byte], dict: ZDict,
      requireChecksum: Boolean = true): Option[Array[Byte]] =
    try {
      val (content, end) = frameAt(b, 0, requireChecksum, dict)
      if (end != b.length) None else Some(content)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** STRICT single-frame decode → content, or None for anything
    * malformed or out of scope (see object doc). Trailing bytes —
    * including further frames — quarantine; [[decodeConcat]] is the
    * multi-frame surface. */
  def decode(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val (content, end) = frameAt(b, 0)
      if (end != b.length) None else Some(content)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** STRICT concatenated-frames decode — the append-writer shape a
    * real `.jsonl.zst` accumulates (`zstd` output concatenates; so do
    * log rotations): every frame must verify under the [[decode]]
    * scope, the byte stream must be EXACTLY a frame sequence (no
    * gaps, no trailer), and at least one DATA frame must be present.
    * SKIPPABLE frames (RFC 8878 §3.1.2 — magic 0x184D2A50..5F +
    * 32-bit size + opaque user data; what seekable-zstd seek tables
    * and padding tools insert between data frames) are skipped after
    * a bounds check. Returns the per-data-frame contents in order,
    * or None. */
  def decodeConcat(b: Array[Byte]): Option[Seq[Array[Byte]]] =
    try {
      if (b.length == 0) return None
      def u32(i: Int): Long =
        (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
          ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
      val out = Seq.newBuilder[Array[Byte]]
      var p = 0
      var total = 0L
      while (p < b.length) {
        if (p + 8 <= b.length && (u32(p) & 0xFFFFFFF0L) == 0x184D2A50L) {
          val skip = u32(p + 4)
          if (p + 8 + skip > b.length) throw Malformed
          p += 8 + skip.toInt
        } else {
          val (content, next) = frameAt(b, p)
          total += content.length
          if (total > MAX_CONTENT) throw Malformed
          out += content
          p = next
        }
      }
      val frames = out.result()
      if (frames.isEmpty) throw Malformed // skippables alone carry no data
      Some(frames)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  // ---- encoder --------------------------------------------------------

  /** Bit writer for backward streams: append LSB-first, [[finish]]
    * adds the 1-sentinel and pads to a byte. */
  private[operators] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var n = 0
    def add(v: Long, bits: Int): Unit = {
      acc |= (v & ((1L << bits) - 1)) << n
      n += bits
      while (n >= 8) { out.write((acc & 0xFF).toInt); acc >>>= 8; n -= 8 }
    }
    def finish(): Array[Byte] = {
      add(1, 1)
      if (n > 0) { out.write((acc & 0xFF).toInt); acc = 0; n = 0 }
      out.toByteArray
    }
  }

  /** Per-symbol cell lists for the three predefined tables (encoder
    * hot path: avoids a whole-table scan per symbol). */
  private def cellsOf(t: FseTable): Array[Array[Int]] = {
    val maxS = t.sym.max
    val out = Array.fill(maxS + 1)(List.empty[Int])
    var u = t.size - 1
    while (u >= 0) { out(t.sym(u)) = u :: out(t.sym(u)); u -= 1 }
    out.map(_.toArray)
  }
  private lazy val LL_CELLS = cellsOf(LL_TABLE)
  private lazy val ML_CELLS = cellsOf(ML_TABLE)
  private lazy val OF_CELLS = cellsOf(OF_TABLE)

  /** tANS encode one symbol against a decode table: the unique cell of
    * `symbol` whose [base, base+2^nb) interval covers `state` — emit
    * the offset, land on that cell. Returns the new state. */
  private def fseEncode(t: FseTable, cells: Array[Array[Int]], symbol: Int,
                        state: Int, w: BitWriter): Int = {
    val cs = cells(symbol)
    var i = 0
    while (i < cs.length) {
      val u = cs(i)
      if (state >= t.base(u) && state < t.base(u) + (1 << t.nb(u))) {
        w.add((state - t.base(u)).toLong, t.nb(u))
        return u
      }
      i += 1
    }
    throw Malformed // symbol has zero probability — caller guarantees not
  }

  private def llCodeOf(v: Int): Int = {
    if (v < 16) return v
    var c = 35
    while (LL_BASE(c) > v) c -= 1
    c
  }
  private def mlCodeOf(v: Int): Int = {
    if (v <= 34) return v - 3
    var c = 52
    while (ML_BASE(c) > v) c -= 1
    c
  }

  private final case class Seq3(litLen: Int, offsetValue: Long, matchLen: Int)

  /** Greedy hash-table matcher over [from, to) with full-content
    * history (single-segment window): sequences + the literal bytes. */
  private def findSequences(src: Array[Byte], from: Int, to: Int,
                            table: Array[Int]): (Vector[Seq3], Array[Byte]) = {
    val seqs = Vector.newBuilder[Seq3]
    val lits = new java.io.ByteArrayOutputStream()
    def u32(i: Int): Int =
      (src(i) & 0xFF) | ((src(i + 1) & 0xFF) << 8) |
        ((src(i + 2) & 0xFF) << 16) | ((src(i + 3) & 0xFF) << 24)
    def hash(v: Int): Int = (v * -1640531535) >>> (32 - 13)
    var anchor = from
    var i = from
    while (i + 4 <= to) {
      val h = hash(u32(i))
      val cand = table(h)
      table(h) = i
      if (cand >= 0 && cand < i && i + 4 <= to && u32(cand) == u32(i)) {
        var ml = 4
        while (i + ml < to && src(cand + ml) == src(i + ml)) ml += 1
        val litLen = i - anchor
        lits.write(src, anchor, litLen)
        seqs += Seq3(litLen, (i - cand).toLong + 3L, ml)
        i += ml
        anchor = i
      } else i += 1
    }
    lits.write(src, anchor, to - anchor)
    (seqs.result(), lits.toByteArray)
  }

  /** huff0 single-stream compress with DIRECT weights, or None when
    * not applicable/beneficial (one distinct byte, symbol ≥ 128 —
    * direct weights list at most 128 — code length > 11, or no win). */
  private[operators] def huffCompress(lits: Array[Byte]): Option[Array[Byte]] = {
    if (lits.length < 16 || lits.length > 1023) return None
    val freq = new Array[Int](256)
    var maxSym = 0
    lits.foreach { b =>
      val v = b & 0xFF
      freq(v) += 1
      if (v > maxSym) maxSym = v
    }
    if (maxSym >= 128) return None // direct-weight header limit
    val present = freq.count(_ > 0)
    if (present < 2) return None // RLE territory
    // standard Huffman lengths via two sorted queues
    val leaves = (0 to maxSym).filter(freq(_) > 0)
      .map(s => (freq(s).toLong, List(s))).sortBy(_._1)
    var q1 = leaves.toList
    var q2 = List.empty[(Long, List[Int])]
    val depth = new Array[Int](maxSym + 1)
    def popMin(): (Long, List[Int]) = (q1, q2) match {
      case (h1 :: t1, h2 :: _) if h1._1 <= h2._1 => q1 = t1; h1
      case (h1 :: t1, Nil) => q1 = t1; h1
      case (_, h2 :: t2) => q2 = t2; h2
      case _ => throw Malformed
    }
    var count = q1.size
    while (count > 1) {
      val a = popMin(); val b = popMin()
      b._2.foreach(s => depth(s) += 1)
      a._2.foreach(s => depth(s) += 1)
      q2 = q2 :+ (a._1 + b._1, a._2 ++ b._2)
      count -= 1
    }
    val maxLen = (0 to maxSym).filter(freq(_) > 0).map(depth).max
    if (maxLen > 11 || maxLen < 1) return None
    val weights = new Array[Int](maxSym + 1)
    (0 to maxSym).foreach { s =>
      weights(s) = if (freq(s) > 0) maxLen + 1 - depth(s) else 0
    }
    val table = new HuffTable(java.util.Arrays.copyOf(weights, maxSym))
    if (table.weights(maxSym) != weights(maxSym)) return None // Kraft mismatch
    // tree description: direct 4-bit weights for symbols 0..maxSym-1
    val desc = new java.io.ByteArrayOutputStream()
    desc.write(127 + maxSym)
    var i = 0
    while (i < maxSym) {
      val hi = weights(i)
      val lo = if (i + 1 < maxSym) weights(i + 1) else 0
      desc.write((hi << 4) | lo)
      i += 2
    }
    // stream: symbols encoded last→first so the decoder reads forward
    val w = new BitWriter
    val tl = table.tableLog
    var j = lits.length - 1
    while (j >= 0) {
      val s = lits(j) & 0xFF
      val wt = weights(s)
      val nbBits = tl + 1 - wt
      w.add((table.cellStart(s) >> (wt - 1)).toLong, nbBits)
      j -= 1
    }
    val stream = w.finish()
    val comp = desc.size() + stream.length
    if (comp >= lits.length || comp > 1023) return None
    val h = 2 | (lits.length << 4) | (comp << 14) // type Compressed, 1-stream
    val out = new java.io.ByteArrayOutputStream(3 + comp)
    out.write(h & 0xFF); out.write((h >> 8) & 0xFF); out.write((h >> 16) & 0xFF)
    desc.writeTo(out)
    out.write(stream, 0, stream.length)
    Some(out.toByteArray)
  }

  private def rawLiteralsSection(lits: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(3 + lits.length)
    if (lits.length < 32) out.write(lits.length << 3) // sizeFmt 00, type Raw
    else if (lits.length < 4096) {
      out.write(((lits.length & 0xF) << 4) | 4) // sizeFmt 01
      out.write(lits.length >> 4)
    } else {
      out.write(((lits.length & 0xF) << 4) | 12) // sizeFmt 11
      out.write((lits.length >> 4) & 0xFF)
      out.write(lits.length >> 12)
    }
    out.write(lits, 0, lits.length)
    out.toByteArray
  }

  private def rleLiteralsSection(byte: Byte, regen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4)
    if (regen < 32) out.write((regen << 3) | 1)
    else {
      out.write(((regen & 0xF) << 4) | 5)
      out.write(regen >> 4)
    }
    out.write(byte & 0xFF)
    out.toByteArray
  }

  /** Sequence bitstream under the PREDEFINED tables: reverse-order
    * tANS chaining — write order is the exact reverse of the decode
    * read order (see decodeCompressedBlock). */
  private def encodeSequences(seqs: Vector[Seq3]): Array[Byte] = {
    val n = seqs.length
    val llC = seqs.map(s => llCodeOf(s.litLen))
    val mlC = seqs.map(s => mlCodeOf(s.matchLen))
    val ofC = seqs.map(s => 63 - java.lang.Long.numberOfLeadingZeros(s.offsetValue))
    val w = new BitWriter
    // last sequence: extra bits only; states picked without emitting
    var i = n - 1
    w.add(seqs(i).litLen - LL_BASE(llC(i)), LL_XBITS(llC(i)))
    w.add(seqs(i).matchLen - ML_BASE(mlC(i)), ML_XBITS(mlC(i)))
    w.add(seqs(i).offsetValue - (1L << ofC(i)), ofC(i))
    // initial states: any cell of the symbol works, no bits emitted —
    // the decoder reads the cell index verbatim as the init state
    var llS = LL_CELLS(llC(i))(0)
    var mlS = ML_CELLS(mlC(i))(0)
    var ofS = OF_CELLS(ofC(i))(0)
    i -= 1
    while (i >= 0) {
      ofS = fseEncode(OF_TABLE, OF_CELLS, ofC(i), ofS, w)
      mlS = fseEncode(ML_TABLE, ML_CELLS, mlC(i), mlS, w)
      llS = fseEncode(LL_TABLE, LL_CELLS, llC(i), llS, w)
      w.add(seqs(i).litLen - LL_BASE(llC(i)), LL_XBITS(llC(i)))
      w.add(seqs(i).matchLen - ML_BASE(mlC(i)), ML_XBITS(mlC(i)))
      w.add(seqs(i).offsetValue - (1L << ofC(i)), ofC(i))
      i -= 1
    }
    w.add(mlS.toLong, ML_TABLE.accLog)
    w.add(ofS.toLong, OF_TABLE.accLog)
    w.add(llS.toLong, LL_TABLE.accLog)
    w.finish()
  }

  /** Encode content as ONE single-segment frame with content checksum,
    * blocks cut every `blockCut` bytes (≤ 1023 — the encoder's huff0
    * single-stream ceiling). Each block compresses (huff0 literals +
    * predefined-FSE sequences) or stores raw, whichever is smaller. */
  def encodeFrame(content: Array[Byte], blockCut: Int): Array[Byte] =
    encodeFrameImpl(content, blockCut, null)

  /** The d143 surface: the dictionary's content becomes match-history
    * PREFIX (matches may reach back into it — that's the whole win on
    * small records), and a nonzero dict id is stamped in the frame
    * header so the wrong dictionary can't silently decode garbage. */
  private[graft] def encodeFrameWithDict(content: Array[Byte], dict: ZDict,
      blockCut: Int): Array[Byte] = encodeFrameImpl(content, blockCut, dict)

  private def encodeFrameImpl(content: Array[Byte], blockCut: Int,
      dict: ZDict): Array[Byte] = {
    require(blockCut >= 1 && blockCut <= 1023, "blockCut out of range")
    val out = new java.io.ByteArrayOutputStream(content.length + 64)
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    w32(MAGIC)
    val len = content.length
    val fcsFlag = if (len <= 255) 0 else if (len <= 65535 + 256) 1 else 2
    val didFlag =
      if (dict == null || dict.id == 0) 0
      else if (dict.id <= 255) 1
      else if (dict.id <= 65535) 2
      else 3
    out.write((fcsFlag << 6) | 0x20 | 0x04 | didFlag) // single-segment + checksum
    if (didFlag != 0) {
      val nb = didFlag match { case 1 => 1; case 2 => 2; case _ => 4 }
      var i = 0
      while (i < nb) { out.write(((dict.id >> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    fcsFlag match {
      case 0 => out.write(len)
      case 1 => out.write((len - 256) & 0xFF); out.write((len - 256) >> 8)
      case _ => w32(len.toLong)
    }
    // the matcher runs over dict-prefix + content so matches can reach
    // back into the dictionary; block boundaries stay content-relative
    val dictLen = if (dict == null) 0 else dict.content.length
    val full =
      if (dictLen == 0) content
      else {
        val f = new Array[Byte](dictLen + len)
        System.arraycopy(dict.content, 0, f, 0, dictLen)
        System.arraycopy(content, 0, f, dictLen, len)
        f
      }
    val hashTable = new Array[Int](1 << 13)
    java.util.Arrays.fill(hashTable, -1)
    if (dictLen >= 4) {
      def u32at(i: Int): Int =
        (full(i) & 0xFF) | ((full(i + 1) & 0xFF) << 8) |
          ((full(i + 2) & 0xFF) << 16) | ((full(i + 3) & 0xFF) << 24)
      var i = 0
      while (i + 4 <= dictLen) {
        hashTable((u32at(i) * -1640531535) >>> (32 - 13)) = i
        i += 1
      }
    }
    var p = 0
    var emitted = false
    while (p < len || !emitted) {
      val blockLen = math.min(blockCut, len - p)
      val lastBit = if (p + blockLen >= len) 1 else 0
      val body = if (blockLen == 0) None else {
        val (seqs, lits) = findSequences(full, dictLen + p,
          dictLen + p + blockLen, hashTable)
        val allSame = lits.nonEmpty && lits.forall(_ == lits(0))
        val litsSec =
          if (seqs.isEmpty && allSame && lits.length == blockLen)
            rleLiteralsSection(lits(0), lits.length)
          else huffCompress(lits).getOrElse(rawLiteralsSection(lits))
        val bos = new java.io.ByteArrayOutputStream(blockLen)
        bos.write(litsSec, 0, litsSec.length)
        if (seqs.isEmpty) bos.write(0)
        else {
          val n = seqs.length
          if (n < 128) bos.write(n)
          else { bos.write(128 + (n >> 8)); bos.write(n & 0xFF) }
          bos.write(0) // modes: all predefined
          val stream = encodeSequences(seqs)
          bos.write(stream, 0, stream.length)
        }
        val bytes = bos.toByteArray
        if (bytes.length < blockLen) Some(bytes) else None
      }
      body match {
        case Some(bytes) =>
          val bh = (bytes.length << 3) | (2 << 1) | lastBit
          out.write(bh & 0xFF); out.write((bh >> 8) & 0xFF); out.write((bh >> 16) & 0xFF)
          out.write(bytes, 0, bytes.length)
        case None =>
          val bh = (blockLen << 3) | lastBit // raw
          out.write(bh & 0xFF); out.write((bh >> 8) & 0xFF); out.write((bh >> 16) & 0xFF)
          out.write(content, p, blockLen)
      }
      p += blockLen
      emitted = true
    }
    w32(xxh64low32(content, content.length))
    out.toByteArray
  }
}

/** Seekable zstd (the published zstd-contrib seekable format) for the
  * d123 gate — the RANDOM-ACCESS story compressed shards need at
  * 100 TB: content split into INDEPENDENT zstd frames plus a SEEK
  * TABLE carried in a trailing skippable frame (magic 0x184D2A5E;
  * entries of 4-byte LE compressed/decompressed sizes; a 9-byte
  * footer `num_frames | descriptor | 0x8F92EAB1`), so a reader
  * serves byte range [a,b) by decoding ONLY the covering frames —
  * never the shard. The table is VERIFIED, not trusted: entry count
  * and footer magic checked, the compressed sizes must tile the data
  * region exactly, and every decoded frame must match its declared
  * decompressed size — a lying table quarantines instead of serving
  * wrong bytes. Data frames carry the full d117 scope (checksums
  * required), so zstd-jni remains the independent twin for every
  * member frame; the seek-table grammar is from the public spec.
  * Scope: descriptor 0 (no per-frame seek-table checksums — the
  * frames' own xxHash64 content checksums are the integrity layer). */
object ZstdSeekable {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private val SKIP_MAGIC = 0x184D2A5EL
  private val FOOTER_MAGIC = 0x8F92EAB1L

  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  /** Encode content as a seekable shard: independent frames of
    * `frameCut` bytes each + the seek table. */
  private[graft] def encode(content: Array[Byte], frameCut: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(content.length + 128)
    val sizes = Seq.newBuilder[(Int, Int)]
    var p = 0
    var emitted = false
    while (p < content.length || !emitted) {
      val len = math.min(frameCut, content.length - p)
      val f = ZstdCodec.encodeFrame(
        java.util.Arrays.copyOfRange(content, p, p + len), math.max(1, math.min(len, 1023)))
      out.write(f, 0, f.length)
      sizes += ((f.length, len))
      p += len
      emitted = true
    }
    val entries = sizes.result()
    def w32(v: Long): Unit = {
      out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
      out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
    }
    w32(SKIP_MAGIC)
    w32(entries.length * 8L + 9L) // skippable content size
    entries.foreach { case (c, d) => w32(c.toLong); w32(d.toLong) }
    w32(entries.length.toLong)
    out.write(0) // descriptor: no per-entry checksums
    w32(FOOTER_MAGIC)
    out.toByteArray
  }

  /** Parse and VERIFY the seek table → (compressedSize,
    * decompressedSize) per frame, in order. */
  private[graft] def seekTable(b: Array[Byte]): Option[Seq[(Int, Int)]] =
    try {
      if (b.length < 17 || u32(b, b.length - 4) != FOOTER_MAGIC) return None
      val desc = b(b.length - 5) & 0xFF
      if (desc != 0) throw Malformed // per-entry checksums out of scope
      val n = u32(b, b.length - 9)
      if (n <= 0 || n > (1 << 20)) throw Malformed
      val tableBytes = n * 8 + 9
      val skipStart = b.length - 8 - tableBytes
      if (skipStart < 0) throw Malformed
      if (u32(b, skipStart.toInt) != SKIP_MAGIC) throw Malformed
      if (u32(b, skipStart.toInt + 4) != tableBytes) throw Malformed
      val entries = Seq.newBuilder[(Int, Int)]
      var p = skipStart.toInt + 8
      var compTotal = 0L
      var i = 0L
      while (i < n) {
        val c = u32(b, p); val d = u32(b, p + 4)
        if (c <= 0 || d < 0 || d > (1 << 26)) throw Malformed
        entries += ((c.toInt, d.toInt))
        compTotal += c
        p += 8
        i += 1
      }
      // the declared frames must TILE the data region exactly
      if (compTotal != skipStart) throw Malformed
      Some(entries.result())
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  /** Random access: decode ONLY the frames covering byte range
    * [from, from+len) of the decompressed content; every touched
    * frame is verified against its declared size and its own content
    * checksum. Returns None on a lying table or malformed frame. */
  private[graft] def readRange(b: Array[Byte], from: Long, len: Long): Option[Array[Byte]] =
    try {
      val table = seekTable(b).getOrElse(throw Malformed)
      val total = table.map(_._2.toLong).sum
      if (from < 0 || len < 0 || from + len > total) throw Malformed
      val out = new Array[Byte](len.toInt)
      var comp = 0L // compressed offset of the current frame
      var dec = 0L // decompressed offset
      var written = 0
      table.foreach { case (c, d) =>
        val fEnd = dec + d
        if (fEnd > from && dec < from + len && len > 0) {
          val frame = ZstdCodec.decode(
            java.util.Arrays.copyOfRange(b, comp.toInt, (comp + c).toInt))
            .getOrElse(throw Malformed)
          if (frame.length != d) throw Malformed // table lies about the size
          val a = math.max(from, dec)
          val z = math.min(from + len, fEnd)
          System.arraycopy(frame, (a - dec).toInt, out, written, (z - a).toInt)
          written += (z - a).toInt
        }
        comp += c
        dec = fEnd
      }
      Some(out)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
}

/** d119 — the `.jsonl.zst` reading path itself, the reason d117
  * exists: modern corpus releases ship newline-delimited JSON records
  * inside (often CONCATENATED) zstd frames. The sim builds the real
  * thing from the corpus text — one JSON record per text line
  * (`{"id":doc_id*1000+k,"text":"<line>"}`, strings JSON-escaped),
  * framed as ONE frame or (doc_id%5==2) TWO concatenated frames cut
  * mid-blob (the append-writer shape; frame boundaries are transparent
  * to the record stream). The row source strictly [[ZstdCodec
  * .decodeConcat]]s, splits records, and hands LINES to the plan —
  * JSON parsing is Catalyst's own `from_json`, aggregation is a
  * partial-agg groupBy: the Spark-first split between byte-format
  * decoding (ours) and relational work (the engine's). Damaged docs
  * (doc_id%7∈{0,3,5}: truncation / magic / checksum-bit) contribute
  * nothing — the d105/d111 row-source rule; d117 is where zstd
  * quarantine is audited. */
object ZstdJsonlSim {

  private[graft] def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private[graft] def jsonlBytes(docId: Long, text: String): Array[Byte] =
    text.split("\n", -1).zipWithIndex.map { case (l, k) =>
      s"""{"id":${docId * 1000 + k},"text":"${escape(l)}"}"""
    }.mkString("\n").getBytes("UTF-8")

  private[graft] def nFrames(docId: Long): Int = if (docId % 5 == 2) 2 else 1

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val blob = jsonlBytes(docId, text)
    val cut = ZstdSim.blockCut(docId)
    val clean =
      if (nFrames(docId) == 2) {
        val mid = blob.length / 2
        ZstdCodec.encodeFrame(java.util.Arrays.copyOfRange(blob, 0, mid), cut) ++
          ZstdCodec.encodeFrame(
            java.util.Arrays.copyOfRange(blob, mid, blob.length), cut)
      } else ZstdCodec.encodeFrame(blob, cut)
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(clean, clean.length - 3)
      case 3 => val d = clean.clone(); d(0) = 'X'; d
      case 5 =>
        val d = clean.clone()
        d(d.length - 2) = (d(d.length - 2) ^ 0x10).toByte
        d
      case _ => clean
    }
  }

  val lineSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_frames", LongType),
    StructField("line", StringType)))

  /** The row source: strict multi-frame decode → one row per JSONL
    * record line. Map-only flatMap (ingest parallelism IS scan
    * parallelism); damaged payloads yield nothing. */
  def lines(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(lineSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            ZstdCodec.decodeConcat(payloadFor(id, r.getString(1))) match {
              case Some(frames) =>
                val total = frames.map(_.length).sum
                val blob = new Array[Byte](total)
                var o = 0
                frames.foreach { f =>
                  System.arraycopy(f, 0, blob, o, f.length); o += f.length
                }
                new String(blob, "UTF-8").split("\n", -1).toSeq
                  .map(l => Row(id, frames.length.toLong, l))
              case None => Nil
            }
          }
        }
      }(enc)
  }
}

/** d123 gate — RANDOM ACCESS into compressed shards: each doc's text
  * becomes a seekable-zstd shard (independent frames of 500+doc_id%300
  * bytes + the verified seek table), and the gate serves ONE
  * closed-form byte range per doc through [[ZstdSeekable.readRange]]
  * — decoding only the covering frames, the way a 100 TB range read
  * works. Damage slice on doc_id%7: 0 → truncated mid footer magic,
  * 3 → footer magic stomped, 5 → one table entry's DECOMPRESSED size
  * bumped — every frame stays intact and every checksum passes; only
  * the decode-vs-declared-size verify catches a lying table (the
  * trust boundary random access lives on). */
object ZstdSeekSim {

  private[graft] def frameCut(docId: Long): Int = (500 + docId % 300).toInt

  private[graft] def rangeOf(docId: Long, nBytes: Int): (Long, Long) = {
    val off = (docId * 37) % math.max(1, nBytes)
    val rlen = math.min(nBytes - off, 200 + docId % 100)
    (off, rlen)
  }

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val clean = ZstdSeekable.encode(text.getBytes("UTF-8"), frameCut(docId))
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(clean, clean.length - 3)
      case 3 => val d = clean.clone(); d(d.length - 2) = 'X'; d
      case 5 =>
        val nBytes = text.getBytes("UTF-8").length
        if (nBytes == 0) java.util.Arrays.copyOf(clean, clean.length - 3)
        else {
          // bump the DECOMPRESSED size of the frame the doc's own
          // range READS (fi = off/cut) — the lie sits on the read
          // path, so the decode-vs-declared verify must catch it
          val d = clean.clone()
          val n = ((d(d.length - 9) & 0xFFL) | ((d(d.length - 8) & 0xFFL) << 8) |
            ((d(d.length - 7) & 0xFFL) << 16) | ((d(d.length - 6) & 0xFFL) << 24)).toInt
          val fi = (rangeOf(docId, nBytes)._1 / frameCut(docId)).toInt
          val entry = d.length - 8 - (n * 8 + 9) + 8 + fi * 8
          // Carry-propagating +1 on the full 32-bit declared size: a
          // low-byte-only bump self-cancels when the size ≡ 255 mod 256
          // (0xFF→0x00 shrinks the lie by 255 and may miss the read).
          val sz = ((d(entry + 4) & 0xFFL) | ((d(entry + 5) & 0xFFL) << 8) |
            ((d(entry + 6) & 0xFFL) << 16) | ((d(entry + 7) & 0xFFL) << 24)) + 1L
          d(entry + 4) = (sz & 0xFF).toByte
          d(entry + 5) = ((sz >> 8) & 0xFF).toByte
          d(entry + 6) = ((sz >> 16) & 0xFF).toByte
          d(entry + 7) = ((sz >> 24) & 0xFF).toByte
          d
        }
      case _ => clean
    }
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_frames", LongType),
    StructField("total_bytes", LongType),
    StructField("range_off", LongType),
    StructField("range_len", LongType),
    StructField("range_ok", BooleanType)))

  /** Batched seek-table walk + range read → per-doc stats with
    * quarantine — the d123 gate (map-only). `range_ok` is the in-plan
    * byte-exact verdict against the original text slice. */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val bytes = r.getString(1).getBytes("UTF-8")
            val shard = payloadFor(id, r.getString(1))
            val (off, rlen) = rangeOf(id, bytes.length)
            ZstdSeekable.seekTable(shard)
              .flatMap(t => ZstdSeekable.readRange(shard, off, rlen)
                .map(rg => (t, rg))) match {
              case Some((table, range)) =>
                Row(id, "ok", table.length.toLong,
                  table.map(_._2.toLong).sum, off, rlen,
                  java.lang.Boolean.valueOf(java.util.Arrays.equals(range,
                    java.util.Arrays.copyOfRange(bytes, off.toInt,
                      (off + rlen).toInt))))
              case None =>
                Row(id, "quarantined", null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}

/** d117 gate — the corpus's REAL text through the zstd frame codec
  * (the d115/d106 discipline): each doc's text is framed in-plan with
  * a closed-form block cut (600 + doc_id%400 bytes — multi-block for
  * longer texts, block count replayable as ceil(bytes/cut)), strictly
  * decoded, and reduced to stats the oracle replays off
  * documents.text: block count, exact byte total, line count, plus
  * the in-plan round-trip verdict. Damage slice on doc_id%7: 0 →
  * truncated mid content-checksum, 3 → magic stomped, 5 → one content
  * checksum bit flipped (the integrity field the frame exists for). */
object ZstdSim {

  private[graft] def blockCut(docId: Long): Int = (600 + docId % 400).toInt

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val clean = ZstdCodec.encodeFrame(text.getBytes("UTF-8"), blockCut(docId))
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(clean, clean.length - 3)
      case 3 => val d = clean.clone(); d(0) = 'X'; d
      case 5 =>
        val d = clean.clone()
        d(d.length - 2) = (d(d.length - 2) ^ 0x10).toByte
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

  /** Batched strict decode → per-doc stats with quarantine — the d117
    * gate, same mapPartitions batch contract as the other codec gates
    * (map-only; payload synthesized per row from the real text). */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            ZstdCodec.decode(payloadFor(id, text)) match {
              case Some(content) =>
                var nLines = 1L
                var j = 0
                while (j < content.length) {
                  if (content(j) == '\n') nLines += 1
                  j += 1
                }
                val cut = blockCut(id)
                val nBlocks =
                  math.max(1L, (content.length.toLong + cut - 1) / cut)
                Row(id, "ok", nBlocks, content.length.toLong, nLines,
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
