package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DEFLATE (RFC 1951) + the zlib wrapper (RFC 1950) for the d124 gate —
  * implemented from the published RFCs in BOTH directions, including the
  * Adler-32 checksum, with no borrowed primitive at all. This closes the
  * last entropy layer the repo still rode a library for: gzip (d106),
  * PNG (d98), zip (d113) and Avro-deflate (d121) all decode through
  * `java.util.zip.Inflater`; after r12 built zstd's FSE/tANS + huff0
  * from scratch, DEFLATE was the one coder left. Those gates keep the
  * JDK on their hot paths (it is the faster C implementation); this
  * codec is the from-scratch twin, and the spec cross-checks d106-shape
  * gzip bodies and d98 PNG IDAT streams decoding IDENTICALLY through
  * both inflaters — the strongest interop pin available (the JDK is
  * zlib itself).
  *
  * Decoder scope (the d98/d117 strictness discipline): stored blocks
  * (with the LEN/NLEN complement check), fixed-Huffman blocks, and
  * dynamic-Huffman blocks with the code-length code (16/17/18 repeats,
  * the HCLEN permutation); 32 KiB window; over-subscribed Huffman sets,
  * the RFC's forbidden symbols (BTYPE 11, litlen 286/287, distance
  * 30/31), a leading 16-repeat with no previous length, length-table
  * overruns, distances past the written history, a missing end-of-block
  * code, truncation, bad LEN/NLEN, zlib header/FCHECK/FDICT violations,
  * an Adler-32 mismatch and trailing garbage all QUARANTINE rather than
  * crash. Incomplete Huffman sets follow the RFC's two legal shapes
  * only: a single length-1 code, or the zero-code distance set ("one
  * distance code of zero bits"); decoding an undefined code quarantines.
  *
  * Encoder: greedy hash-table LZ77 over the full 32 KiB window (matches
  * may look back across block boundaries; the spec's 3-byte minimum is
  * honored by emitting only matches >= 4), always-dynamic Huffman blocks
  * (canonical codes with the 15/7-bit limits enforced by frequency
  * halving, RLE'd code lengths through the code-length code), blocks cut
  * at a closed-form boundary so the oracle can replay the block count.
  *
  * Reference behavior anchor: slurm2sql reads gzip-compressed dumps via
  * Python's zlib (slurm2sql.py:854-914 reads sacct output that may be
  * shipped compressed); the coder itself is from RFC 1950/1951 only.
  */
object DeflateCodec {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Decoded-output cap (zip-bomb guard) — same bound as the other
    * codec walkers. */
  private val MAX_BYTES = 1 << 26

  // ---------------------------------------------------------------- adler32

  /** Adler-32 (RFC 1950 §8) from scratch: two running sums mod 65521,
    * folded every 5552 bytes (the largest run that cannot overflow a
    * 32-bit accumulator; we carry Longs so any fold < 2^31 works). */
  private[graft] def adler32(b: Array[Byte], off: Int, len: Int): Long = {
    var s1 = 1L
    var s2 = 0L
    var i = off
    val end = off + len
    while (i < end) {
      val stop = math.min(i + 5552, end)
      while (i < stop) {
        s1 += (b(i) & 0xFF)
        s2 += s1
        i += 1
      }
      s1 %= 65521
      s2 %= 65521
    }
    (s2 << 16) | s1
  }

  // ---------------------------------------------------------- bit plumbing

  /** LSB-first bit reader (RFC 1951 §3.1.1: data elements fill bytes
    * starting at the least-significant bit). */
  private final class LsbBits(buf: Array[Byte], var pos: Int, end: Int) {
    private var bit = 0

    def readBit(): Int = {
      if (pos >= end) throw Malformed
      val v = ((buf(pos) & 0xFF) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }

    def readBits(n: Int): Int = {
      var v = 0
      var got = 0
      while (got < n) {
        if (pos >= end) throw Malformed
        val take = math.min(8 - bit, n - got)
        v |= (((buf(pos) & 0xFF) >> bit) & ((1 << take) - 1)) << got
        got += take
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
      }
      v
    }

    /** Discard the rest of the current byte (stored-block alignment). */
    def alignByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }

    def byteIndex: Int = pos
    def midByte: Boolean = bit != 0

    /** First byte index not consumed (a partially-read byte counts as
      * consumed — the stream owns it). */
    def bytePosCeil: Int = if (bit == 0) pos else pos + 1

    def copyAligned(n: Int, out: Grow): Unit = {
      if (bit != 0) throw Malformed
      if (pos + n > end) throw Malformed
      out.append(buf, pos, n)
      pos += n
    }
  }

  /** Growable output with back-reference copies (the 32 KiB window is
    * the whole history here — documents fit in memory, capped). */
  private final class Grow {
    var a = new Array[Byte](8192)
    var n = 0
    private def ensure(extra: Int): Unit = {
      if (n + extra > MAX_BYTES) throw Malformed
      if (n + extra > a.length) {
        var cap = a.length
        while (cap < n + extra) cap <<= 1
        a = java.util.Arrays.copyOf(a, math.min(cap, MAX_BYTES))
      }
    }
    def append(b: Byte): Unit = { ensure(1); a(n) = b; n += 1 }
    def append(src: Array[Byte], off: Int, len: Int): Unit = {
      ensure(len); System.arraycopy(src, off, a, n, len); n += len
    }
    /** LZ77 copy: byte-by-byte so overlapping matches replicate. */
    def copyBack(dist: Int, len: Int): Unit = {
      if (dist <= 0 || dist > n) throw Malformed
      ensure(len)
      var i = 0
      while (i < len) { a(n) = a(n - dist); n += 1; i += 1 }
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(a, n)
  }

  // ------------------------------------------------------- huffman decode

  /** Canonical Huffman decoder over a code-length array (RFC 1951
    * §3.2.2). Bit-serial decode with per-length first-code/offset
    * tables. Over-subscribed sets throw; incomplete sets are legal
    * only in the RFC's two shapes: zero codes (the all-literal
    * distance set) or a single length-1 code. */
  private[operators] final class Huff(lengths: Array[Int], maxLen: Int) {
    private val count = new Array[Int](maxLen + 1)
    locally {
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l < 0 || l > maxLen) throw Malformed
        if (l > 0) count(l) += 1
        i += 1
      }
    }
    val nSyms: Int = count.sum
    locally {
      // Kraft audit: left = remaining code space after each length
      var left = 1
      var l = 1
      while (l <= maxLen) {
        left <<= 1
        left -= count(l)
        if (left < 0) throw Malformed // over-subscribed
        l += 1
      }
      if (left > 0 && nSyms > 1) throw Malformed // incomplete, not the 1-code shape
      if (left > 0 && nSyms == 1 && count(1) != 1) throw Malformed
    }
    private val offs = new Array[Int](maxLen + 1)
    locally {
      var l = 1
      while (l < maxLen) { offs(l + 1) = offs(l) + count(l); l += 1 }
    }
    private val syms = new Array[Int](nSyms)
    locally {
      val next = offs.clone()
      var s = 0
      while (s < lengths.length) {
        val l = lengths(s)
        if (l > 0) { syms(next(l)) = s; next(l) += 1 }
        s += 1
      }
    }

    def decode(r: LsbBits): Int = {
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
      throw Malformed // walked past every defined code
    }
  }

  // fixed-Huffman tables (RFC 1951 §3.2.6)
  private val fixedLit: Huff = {
    val l = new Array[Int](288)
    var i = 0
    while (i < 288) {
      l(i) = if (i < 144) 8 else if (i < 256) 9 else if (i < 280) 7 else 8
      i += 1
    }
    new Huff(l, 15)
  }
  private val fixedDist: Huff = new Huff(Array.fill(30)(5) ++ Array(5, 5), 15)

  // length/distance symbol tables (RFC 1951 §3.2.5)
  private val LBASE = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23,
    27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val LEXT = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
    3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  private val DBASE = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97,
    129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193,
    12289, 16385, 24577)
  private val DEXT = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
    7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)
  private val CLORDER = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12,
    3, 13, 2, 14, 1, 15)

  // ------------------------------------------------------------- inflate

  /** Strict raw-DEFLATE decode starting at byte `start`. Returns
    * (content, firstByteAfterStream, blockCount). Throws Malformed on
    * any structural violation. */
  private[graft] def inflateRaw(b: Array[Byte], start: Int,
                                end: Int): (Array[Byte], Int, Int) = {
    val r = new LsbBits(b, start, end)
    val out = new Grow
    var nBlocks = 0
    var fin = false
    while (!fin) {
      fin = r.readBit() == 1
      nBlocks += 1
      r.readBits(2) match {
        case 0 => // stored
          r.alignByte()
          val len = r.readBits(16)
          val nlen = r.readBits(16)
          if ((len ^ 0xFFFF) != nlen) throw Malformed
          r.copyAligned(len, out)
        case 1 =>
          decodeBlock(r, out, fixedLit, fixedDist)
        case 2 =>
          val hlit = r.readBits(5) + 257
          val hdist = r.readBits(5) + 1
          val hclen = r.readBits(4) + 4
          if (hlit > 286 || hdist > 30) throw Malformed
          val clLens = new Array[Int](19)
          var i = 0
          while (i < hclen) { clLens(CLORDER(i)) = r.readBits(3); i += 1 }
          val cl = new Huff(clLens, 7)
          if (cl.nSyms < 2) throw Malformed // CL set must be complete (zlib rule)
          val lens = new Array[Int](hlit + hdist)
          var p = 0
          while (p < lens.length) {
            cl.decode(r) match {
              case s if s < 16 => lens(p) = s; p += 1
              case 16 =>
                if (p == 0) throw Malformed // repeat with no previous length
                val rep = 3 + r.readBits(2)
                if (p + rep > lens.length) throw Malformed
                val v = lens(p - 1)
                var k = 0
                while (k < rep) { lens(p) = v; p += 1; k += 1 }
              case 17 =>
                val rep = 3 + r.readBits(3)
                if (p + rep > lens.length) throw Malformed
                p += rep
              case _ => // 18
                val rep = 11 + r.readBits(7)
                if (p + rep > lens.length) throw Malformed
                p += rep
            }
          }
          val litLens = java.util.Arrays.copyOfRange(lens, 0, hlit)
          if (litLens(256) == 0) throw Malformed // no end-of-block code
          val lit = new Huff(litLens, 15)
          val dist = new Huff(java.util.Arrays.copyOfRange(lens, hlit,
            hlit + hdist), 15)
          decodeBlock(r, out, lit, dist)
        case _ => throw Malformed // BTYPE 11 reserved
      }
    }
    (out.result(), r.bytePosCeil, nBlocks)
  }

  private def decodeBlock(r: LsbBits, out: Grow, lit: Huff,
                          dist: Huff): Unit = {
    var done = false
    while (!done) {
      val sym = lit.decode(r)
      if (sym < 256) out.append(sym.toByte)
      else if (sym == 256) done = true
      else {
        if (sym > 285) throw Malformed // 286/287 forbidden
        val li = sym - 257
        val len = LBASE(li) + r.readBits(LEXT(li))
        val ds = dist.decode(r)
        if (ds > 29) throw Malformed // 30/31 forbidden
        val d = DBASE(ds) + r.readBits(DEXT(ds))
        out.copyBack(d, len)
      }
    }
  }

  // -------------------------------------------------------- bit writing

  /** LSB-first bit writer. Huffman codes enter MSB-first per the RFC,
    * so callers pass them through [[rev]]. */
  private[operators] final class LsbWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def add(v: Int, bits: Int): Unit = {
      cur |= (v & ((1 << bits) - 1)) << nb
      nb += bits
      while (nb >= 8) { out.write(cur & 0xFF); cur >>>= 8; nb -= 8 }
    }
    def finish(): Array[Byte] = {
      if (nb > 0) { out.write(cur & 0xFF); cur = 0; nb = 0 }
      out.toByteArray
    }
  }

  private def rev(v: Int, bits: Int): Int = {
    var r = 0
    var i = 0
    while (i < bits) { r = (r << 1) | ((v >> i) & 1); i += 1 }
    r
  }

  // ------------------------------------------------------ huffman encode

  /** Canonical Huffman code lengths for `freq`, depth-limited to
    * `maxLen` by frequency halving (halve-and-retry always converges:
    * equal frequencies give a balanced tree, depth <= ceil(log2 n) <=
    * 9 for n <= 288 symbols — and yields a COMPLETE canonical set,
    * which the strict decoders on both sides require). A single used
    * symbol gets length 1 (the RFC's legal incomplete shape). */
  private[operators] def huffLengths(freq: Array[Long],
                                     maxLen: Int): Array[Int] = {
    val lens = new Array[Int](freq.length)
    val used = freq.indices.filter(freq(_) > 0)
    if (used.isEmpty) return lens
    if (used.length == 1) { lens(used.head) = 1; return lens }
    var f = freq.clone()
    var ok = false
    while (!ok) {
      java.util.Arrays.fill(lens, 0)
      // two-queue Huffman over the used symbols
      var q1 = used.map(s => (f(s), List(s))).sortBy(_._1).toList
      var q2 = List.empty[(Long, List[Int])]
      def popMin(): (Long, List[Int]) = (q1, q2) match {
        case (h1 :: t1, h2 :: _) if h1._1 <= h2._1 => q1 = t1; h1
        case (h1 :: t1, Nil) => q1 = t1; h1
        case (_, h2 :: t2) => q2 = t2; h2
        case _ => throw Malformed
      }
      var count = used.length
      while (count > 1) {
        val a = popMin(); val b2 = popMin()
        a._2.foreach(s => lens(s) += 1)
        b2._2.foreach(s => lens(s) += 1)
        q2 = q2 :+ (a._1 + b2._1, a._2 ++ b2._2)
        count -= 1
      }
      if (used.forall(lens(_) <= maxLen)) ok = true
      else f = f.map(v => if (v > 0) (v + 1) >> 1 else 0L)
    }
    lens
  }

  /** Canonical code values from lengths (RFC 1951 §3.2.2). */
  private[operators] def canonCodes(lens: Array[Int],
                                    maxLen: Int): Array[Int] = {
    val count = new Array[Int](maxLen + 1)
    lens.foreach(l => if (l > 0) count(l) += 1)
    val next = new Array[Int](maxLen + 1)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      code = (code + count(l - 1)) << 1
      next(l) = code
      l += 1
    }
    val codes = new Array[Int](lens.length)
    var s = 0
    while (s < lens.length) {
      if (lens(s) > 0) { codes(s) = next(lens(s)); next(lens(s)) += 1 }
      s += 1
    }
    codes
  }

  // --------------------------------------------------------------- deflate

  private val lenCodeOf: Array[Int] = { // length 3..258 -> symbol 257..285
    val a = new Array[Int](259)
    var sym = 0
    var len = 3
    while (len <= 258) {
      while (sym < 28 && len >= LBASE(sym + 1)) sym += 1
      a(len) = 257 + (if (len == 258) 28 else sym)
      len += 1
    }
    a
  }

  private def distCodeOf(d: Int): Int = {
    var s = 29
    while (DBASE(s) > d) s -= 1
    s
  }

  private final case class Tok(lit: Int, len: Int, dist: Int) // lit < 0 => match

  /** Raw DEFLATE encode: dynamic-Huffman blocks cut every `blockCut`
    * content bytes; greedy LZ77 with a 13-bit hash table over the full
    * window (matches may reach back across block cuts — the window is
    * stream-wide — but never extend past the cut, so block k decodes
    * exactly content[k*cut, (k+1)*cut)). */
  private[graft] def deflateRaw(src: Array[Byte], blockCut: Int): Array[Byte] = {
    val n = src.length
    val w = new LsbWriter
    val HASH_BITS = 13
    val table = new Array[Int](1 << HASH_BITS)
    java.util.Arrays.fill(table, -1)
    def u32(i: Int): Int =
      (src(i) & 0xFF) | ((src(i + 1) & 0xFF) << 8) |
        ((src(i + 2) & 0xFF) << 16) | ((src(i + 3) & 0xFF) << 24)
    def hash(v: Int): Int = (v * -1640531535) >>> (32 - HASH_BITS)

    val nBlocks = math.max(1, (n + blockCut - 1) / blockCut)
    var blk = 0
    while (blk < nBlocks) {
      val from = blk * blockCut
      val to = math.min(n, from + blockCut)
      // tokenize [from, to)
      val toks = Vector.newBuilder[Tok]
      var i = from
      while (i < to) {
        var emitted = false
        if (i + 4 <= n) {
          val h = hash(u32(i))
          val cand = table(h)
          table(h) = i
          if (cand >= 0 && i - cand <= 32768 && i + 4 <= to &&
              u32(cand) == u32(i)) {
            var ml = 4
            val lim = math.min(to - i, 258)
            while (ml < lim && src(cand + ml) == src(i + ml)) ml += 1
            toks += Tok(-1, ml, i - cand)
            // index the skipped positions so later matches can land here
            var k = i + 1
            val ke = math.min(i + ml, n - 3)
            while (k < ke) { table(hash(u32(k))) = k; k += 1 }
            i += ml
            emitted = true
          }
        }
        if (!emitted) { toks += Tok(src(i) & 0xFF, 0, 0); i += 1 }
      }
      writeDynamicBlock(w, toks.result(), last = blk == nBlocks - 1)
      blk += 1
    }
    w.finish()
  }

  private def writeDynamicBlock(w: LsbWriter, toks: Vector[Tok],
                                last: Boolean): Unit = {
    // histograms
    val litFreq = new Array[Long](288)
    val distFreq = new Array[Long](30)
    toks.foreach { t =>
      if (t.lit >= 0) litFreq(t.lit) += 1
      else { litFreq(lenCodeOf(t.len)) += 1; distFreq(distCodeOf(t.dist)) += 1 }
    }
    litFreq(256) += 1 // end-of-block
    val litLens = huffLengths(litFreq, 15)
    val distLens = huffLengths(distFreq, 15)
    val litCodes = canonCodes(litLens, 15)
    val distCodes = canonCodes(distLens, 15)
    val hlit = math.max(257, litLens.lastIndexWhere(_ > 0) + 1)
    val hdist = math.max(1, distLens.lastIndexWhere(_ > 0) + 1)

    // RLE the concatenated lengths through the code-length code
    val all = litLens.take(hlit) ++ distLens.take(hdist)
    val clSyms = Vector.newBuilder[(Int, Int)] // (symbol, extra-bit value)
    var p = 0
    while (p < all.length) {
      val v = all(p)
      var run = 1
      while (p + run < all.length && all(p + run) == v) run += 1
      if (v == 0) {
        var left = run
        while (left >= 11) {
          val take = math.min(left, 138); clSyms += ((18, take - 11)); left -= take
        }
        if (left >= 3) { clSyms += ((17, left - 3)); left = 0 }
        while (left > 0) { clSyms += ((0, -1)); left -= 1 }
        p += run
      } else {
        clSyms += ((v, -1))
        var left = run - 1
        while (left >= 3) {
          val take = math.min(left, 6); clSyms += ((16, take - 3)); left -= take
        }
        while (left > 0) { clSyms += ((v, -1)); left -= 1 }
        p += run
      }
    }
    val cls = clSyms.result()
    val clFreq = new Array[Long](19)
    cls.foreach(s => clFreq(s._1) += 1)
    val clLens = huffLengths(clFreq, 7)
    // the CL set must be COMPLETE (zlib rejects incomplete CL codes):
    // a single used symbol gets length 1 — pad with a dummy length-1
    // code on an unused symbol so the pair completes the tree
    if (clLens.count(_ > 0) == 1) {
      val dummy = clLens.indexWhere(_ == 0)
      clLens(dummy) = 1
    }
    val clCodes = canonCodes(clLens, 7)
    var hclen = 19
    while (hclen > 4 && clLens(CLORDER(hclen - 1)) == 0) hclen -= 1

    // emit
    w.add(if (last) 1 else 0, 1)
    w.add(2, 2) // BTYPE 10
    w.add(hlit - 257, 5)
    w.add(hdist - 1, 5)
    w.add(hclen - 4, 4)
    var i = 0
    while (i < hclen) { w.add(clLens(CLORDER(i)), 3); i += 1 }
    cls.foreach { case (s, extra) =>
      w.add(rev(clCodes(s), clLens(s)), clLens(s))
      if (s == 16) w.add(extra, 2)
      else if (s == 17) w.add(extra, 3)
      else if (s == 18) w.add(extra, 7)
    }
    toks.foreach { t =>
      if (t.lit >= 0) w.add(rev(litCodes(t.lit), litLens(t.lit)), litLens(t.lit))
      else {
        val lc = lenCodeOf(t.len)
        w.add(rev(litCodes(lc), litLens(lc)), litLens(lc))
        val li = lc - 257
        if (LEXT(li) > 0) w.add(t.len - LBASE(li), LEXT(li))
        val dc = distCodeOf(t.dist)
        w.add(rev(distCodes(dc), distLens(dc)), distLens(dc))
        if (DEXT(dc) > 0) w.add(t.dist - DBASE(dc), DEXT(dc))
      }
    }
    w.add(rev(litCodes(256), litLens(256)), litLens(256))
  }

  // ------------------------------------------------------------- zlib wrap

  /** RFC 1950 stream: CMF 0x78 (deflate, 32 KiB window), FCHECK-valid
    * FLG, raw-deflate body, big-endian Adler-32 trailer. */
  private[graft] def zlibEncode(content: Array[Byte], blockCut: Int): Array[Byte] = {
    val body = deflateRaw(content, blockCut)
    val out = new java.io.ByteArrayOutputStream(body.length + 6)
    out.write(0x78)
    out.write(0x01) // (0x78 << 8 | 0x01) % 31 == 0, FDICT 0
    out.write(body, 0, body.length)
    val ad = adler32(content, 0, content.length)
    out.write(((ad >> 24) & 0xFF).toInt)
    out.write(((ad >> 16) & 0xFF).toInt)
    out.write(((ad >> 8) & 0xFF).toInt)
    out.write((ad & 0xFF).toInt)
    out.toByteArray
  }

  /** Strict zlib decode: header grammar, raw inflate, Adler-32 verify,
    * no trailing garbage. Returns (content, blockCount); None on any
    * violation. */
  private[graft] def zlibDecodeCounted(b: Array[Byte]): Option[(Array[Byte], Int)] =
    try {
      if (b.length < 6) throw Malformed
      val cmf = b(0) & 0xFF
      val flg = b(1) & 0xFF
      if ((cmf & 0x0F) != 8) throw Malformed // CM must be deflate
      if ((cmf >> 4) > 7) throw Malformed // CINFO window > 32 KiB
      if ((cmf * 256 + flg) % 31 != 0) throw Malformed // FCHECK
      if ((flg & 0x20) != 0) throw Malformed // FDICT out of scope
      val (content, end, nBlocks) = inflateRaw(b, 2, b.length)
      if (end + 4 != b.length) throw Malformed // short/trailing bytes
      val want = ((b(end) & 0xFFL) << 24) | ((b(end + 1) & 0xFFL) << 16) |
        ((b(end + 2) & 0xFFL) << 8) | (b(end + 3) & 0xFFL)
      if (want != adler32(content, 0, content.length)) throw Malformed
      Some((content, nBlocks))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private[graft] def zlibDecode(b: Array[Byte]): Option[Array[Byte]] =
    zlibDecodeCounted(b).map(_._1)
}

/** In-plan synthesizer + gate for d124 — the Lz4Sim/ZstdSim shape:
  * payloads built per row from the real text, damage on the
  * doc_id%7∈{0,3,5} slice, strict decode with quarantine, stats the
  * DuckDB oracle replays from closed forms. */
object DeflateSim {

  private[graft] def blockCut(docId: Long): Int = (550 + docId % 450).toInt

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val clean = DeflateCodec.zlibEncode(text.getBytes("UTF-8"), blockCut(docId))
    (docId % 7) match {
      case 0 => // truncation: loses the Adler trailer (and a body byte)
        java.util.Arrays.copyOf(clean, clean.length - 5)
      case 3 =>
        // code-length-code corruption — the entropy-layer-only catch:
        // overwrite the first dynamic block's first three 3-bit CL
        // lengths (deflate bits 17..25; body starts at byte 2) with
        // 1,1,1 — three length-1 codes over-subscribe the CL tree
        // (Kraft 3/2 > 1), which any strict inflater must reject
        val d = clean.clone()
        def setBit(p: Int, v: Int): Unit = {
          val by = 2 + p / 8
          val m = 1 << (p % 8)
          d(by) = (if (v == 1) (d(by) | m) else (d(by) & ~m)).toByte
        }
        var k = 0
        while (k < 9) { setBit(17 + k, if (k % 3 == 0) 1 else 0); k += 1 }
        d
      case 5 => // one Adler-32 trailer bit — the integrity field itself
        val d = clean.clone()
        d(d.length - 1) = (d(d.length - 1) ^ 0x10).toByte
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

  /** Batched strict decode → per-doc stats with quarantine. n_blocks is
    * the count the WALKER saw (not the formula) — the oracle's
    * closed-form replay pins the encoder's cut arithmetic through the
    * decoder. */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            DeflateCodec.zlibDecodeCounted(payloadFor(id, text)) match {
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
