package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** XZ / LZMA2 — the OTHER Wikipedia-dump codec (`.xml.xz` /
  * `.jsonl.xz`; the d125 bzip2 pairing's modern sibling) — implemented
  * from the published formats (the xz file format spec and the LZMA
  * specification) in BOTH directions:
  *
  *  - the XZ container: stream header/footer grammar (magic, stream
  *    flags, the CRC32-protected flag copies that must AGREE), block
  *    headers (filter chain, the LZMA2 filter id 0x21, dictionary-size
  *    property, optional size fields, header CRC32), block padding,
  *    per-block data checks (NONE / CRC32 / CRC64 — the CRC64/ECMA
  *    table is ours), and the INDEX: one record per block whose
  *    unpadded/uncompressed sizes are CROSS-CHECKED against the blocks
  *    actually walked (the d123 lying-table discipline — an index is
  *    exactly the thing worth lying about), the backward-size field,
  *    and every multibyte varint's minimality rule;
  *  - LZMA2 chunking: uncompressed chunks (0x01 dict-reset / 0x02),
  *    compressed chunks with the four reset modes (none / state /
  *    state+props / state+props+dict), the 21-bit unpacked and 16-bit
  *    packed sizes, the first-chunk-must-reset rule;
  *  - the FULL LZMA decoder: the binary range coder (11-bit adaptive
  *    probabilities, 2^24 normalization), the 12-state machine,
  *    literal coding with lc/lp context mixing and the MATCHED-literal
  *    path, match/rep-match decoding (all four rep distances), length
  *    coders, position-slot + special-position + align distance
  *    trees; a chunk must consume EXACTLY its packed bytes and leave
  *    the range coder finished, and every distance is bounded by both
  *    the dictionary size and the bytes produced since dict reset;
  *  - a real LZMA encoder: the same range coder run forward (carry
  *    propagation via cache/cacheSize), greedy hash-chain match
  *    finding (the d124 discipline), literal/match/state mirroring of
  *    the decoder, chunked with per-chunk full resets, falling back to
  *    uncompressed chunks when coding doesn't pay.
  *
  * Interop is pinned BOTH directions against XZ for Java (org.tukaani
  * .xz, the reference Java implementation, on the Spark classpath):
  * XZOutputStream's real BT4-match-finder output — rep matches, state
  * carried across chunks, CRC64 checks — decodes through our walker
  * byte-exactly, and our writer's files read back through
  * XZInputStream (XzLzmaSpec). SHA-256 checks are out of scope and
  * quarantine (never guessed at).
  */
object XzLzma {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ------------------------------------------------------------- CRC64

  private val CRC64_POLY = 0xC96C5795D7870F42L // ECMA-182, reflected
  private val crc64Table: Array[Long] = {
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var c = i.toLong
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) (c >>> 1) ^ CRC64_POLY else c >>> 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }
  private[operators] def crc64(b: Array[Byte], from: Int, to: Int): Long = {
    var c = -1L
    var i = from
    while (i < to) {
      c = crc64Table(((c ^ b(i)) & 0xff).toInt) ^ (c >>> 8)
      i += 1
    }
    ~c
  }

  private def crc32(b: Array[Byte], from: Int, to: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(b, from, to - from)
    c.getValue
  }

  // --------------------------------------------------------- LZMA core

  private val STATES = 12
  private val MATCH_LEN_MIN = 2

  /** The adaptive probability model; sized by (lc, lp). */
  private final class Probs(val lc: Int, val lp: Int, val pb: Int) {
    val isMatch = Array.fill((STATES << 4))(1024)
    val isRep = Array.fill(STATES)(1024)
    val isRepG0 = Array.fill(STATES)(1024)
    val isRepG1 = Array.fill(STATES)(1024)
    val isRepG2 = Array.fill(STATES)(1024)
    val isRep0Long = Array.fill(STATES << 4)(1024)
    val posSlot = Array.fill(4 * 64)(1024)
    val specialPos = Array.fill(115)(1024)
    val align = Array.fill(16)(1024)
    // length coders: [0] = match, [1] = rep
    val lenChoice = Array.fill(2 * 2)(1024)
    val lenLow = Array.fill(2 * 16 * 8)(1024)
    val lenMid = Array.fill(2 * 16 * 8)(1024)
    val lenHigh = Array.fill(2 * 256)(1024)
    val literals = Array.fill(0x300 << (lc + lp))(1024)
    val pbMask: Int = (1 << pb) - 1
    val lpMask: Int = (1 << lp) - 1
  }

  private def propsOf(byte: Int): (Int, Int, Int) = {
    if (byte >= 9 * 5 * 5) throw Malformed
    val lc = byte % 9
    val lp = (byte / 9) % 5
    val pb = byte / 45
    if (lc + lp > 4) throw Malformed // the LZMA2 restriction
    (lc, lp, pb)
  }

  // ------------------------------------------------------ range decoder

  private final class RangeDec(b: Array[Byte], var pos: Int, val end: Int) {
    if (pos >= end || b(pos) != 0) throw Malformed // first byte must be 0
    pos += 1
    var range: Int = -1 // 0xFFFFFFFF
    var code: Int = 0
    locally {
      var i = 0
      while (i < 4) {
        if (pos >= end) throw Malformed
        code = (code << 8) | (b(pos) & 0xff); pos += 1
        i += 1
      }
    }
    @inline private def normalize(): Unit =
      if ((range & 0xFF000000) == 0) {
        if (pos >= end) throw Malformed
        range <<= 8
        code = (code << 8) | (b(pos) & 0xff)
        pos += 1
      }
    def bit(probs: Array[Int], i: Int): Int = {
      val p = probs(i)
      val bound = (range >>> 11) * p
      // unsigned compare
      val r =
        if ((code ^ Int.MinValue) < (bound ^ Int.MinValue)) {
          range = bound
          probs(i) = p + ((2048 - p) >> 5)
          0
        } else {
          range -= bound
          code -= bound
          probs(i) = p - (p >> 5)
          1
        }
      normalize()
      r
    }
    def direct(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        range = range >>> 1
        code -= range
        val t = 0 - (code >>> 31)
        code += range & t
        v = (v << 1) + (t + 1)
        normalize()
        i += 1
      }
      v
    }
    def tree(probs: Array[Int], off: Int, nbits: Int): Int = {
      var m = 1
      var i = 0
      while (i < nbits) { m = (m << 1) | bit(probs, off + m); i += 1 }
      m - (1 << nbits)
    }
    def reverseTree(probs: Array[Int], off: Int, nbits: Int): Int = {
      var m = 1
      var sym = 0
      var i = 0
      while (i < nbits) {
        val x = bit(probs, off + m)
        m = (m << 1) | x
        sym |= x << i
        i += 1
      }
      sym
    }
    def finished: Boolean = code == 0
  }

  private def decodeLen(rc: RangeDec, p: Probs, which: Int, posState: Int): Int =
    if (rc.bit(p.lenChoice, which * 2) == 0)
      MATCH_LEN_MIN + rc.tree(p.lenLow, (which * 16 + posState) * 8, 3)
    else if (rc.bit(p.lenChoice, which * 2 + 1) == 0)
      MATCH_LEN_MIN + 8 + rc.tree(p.lenMid, (which * 16 + posState) * 8, 3)
    else
      MATCH_LEN_MIN + 16 + rc.tree(p.lenHigh, which * 256, 8)

  /** Decode one LZMA2 compressed chunk (the dict since the last dict
    * reset lives in dictBuf[dictStart, ...]). Returns the final state
    * for cross-chunk continuation; reps mutate in place. All distance
    * checks treat the 32-bit distance as UNSIGNED before widening —
    * a near-2^32 distance must hit the window bound, never wrap (the
    * zstd offset-narrowing lesson from the r12 advice). */
  private def lzmaChunk(b: Array[Byte], from: Int, to: Int,
      dictBuf: GrowBuf, dictStart: Int,
      unpacked: Int, p: Probs, state0: Int, reps0: Array[Int],
      dictSize: Long): Int = {
    val rc = new RangeDec(b, from, to)
    var state = state0
    val reps = reps0
    val limit = dictBuf.n + unpacked
    def backOf(dist: Int): Long = (dist.toLong & 0xFFFFFFFFL) + 1
    while (dictBuf.n < limit) {
      val totalPos = dictBuf.n - dictStart
      val posState = totalPos & p.pbMask
      if (rc.bit(p.isMatch, (state << 4) + posState) == 0) {
        // literal
        val prev = if (dictBuf.n == dictStart) 0 else dictBuf.a(dictBuf.n - 1) & 0xff
        val ctx = ((totalPos & p.lpMask) << p.lc) + (prev >>> (8 - p.lc))
        val off = 0x300 * ctx
        var sym = 1
        if (state < 7) {
          while (sym < 0x100) sym = (sym << 1) | rc.bit(p.literals, off + sym)
        } else {
          // matched literal
          val back = backOf(reps(0))
          if (back > totalPos || back > dictSize) throw Malformed
          var matchByte = dictBuf.a(dictBuf.n - back.toInt) & 0xff
          var broken = false
          while (sym < 0x100) {
            if (!broken) {
              val matchBit = (matchByte >> 7) & 1
              matchByte <<= 1
              val bit = rc.bit(p.literals, off + ((1 + matchBit) << 8) + sym)
              sym = (sym << 1) | bit
              if (matchBit != bit) broken = true
            } else sym = (sym << 1) | rc.bit(p.literals, off + sym)
          }
        }
        dictBuf.append((sym - 0x100).toByte)
        state = if (state < 4) 0 else if (state < 10) state - 3 else state - 6
      } else {
        var len = 0
        if (rc.bit(p.isRep, state) == 0) {
          // match: new distance
          reps(3) = reps(2); reps(2) = reps(1); reps(1) = reps(0)
          len = decodeLen(rc, p, 0, posState)
          state = if (state < 7) 7 else 10
          val lps = math.min(len - 2, 3)
          val slot = rc.tree(p.posSlot, lps * 64, 6)
          if (slot < 4) reps(0) = slot
          else {
            val footer = (slot >> 1) - 1
            var dist = (2 | (slot & 1)) << footer
            if (slot < 14)
              dist += rc.reverseTree(p.specialPos, dist - slot - 1, footer)
            else {
              dist += rc.direct(footer - 4) << 4
              dist += rc.reverseTree(p.align, 0, 4)
            }
            if (dist == -1) throw Malformed // end marker: illegal in LZMA2
            reps(0) = dist
          }
        } else {
          // rep match
          if (rc.bit(p.isRepG0, state) == 0) {
            if (rc.bit(p.isRep0Long, (state << 4) + posState) == 0) {
              // short rep: one byte at rep0
              state = if (state < 7) 9 else 11
              val back = backOf(reps(0))
              if (back > totalPos || back > dictSize) throw Malformed
              dictBuf.append(dictBuf.a(dictBuf.n - back.toInt))
              len = -1
            }
          } else {
            val dist =
              if (rc.bit(p.isRepG1, state) == 0) {
                val d = reps(1); reps(1) = reps(0); d
              } else if (rc.bit(p.isRepG2, state) == 0) {
                val d = reps(2); reps(2) = reps(1); reps(1) = reps(0); d
              } else {
                val d = reps(3); reps(3) = reps(2); reps(2) = reps(1)
                reps(1) = reps(0); d
              }
            reps(0) = dist
          }
          if (len == 0) {
            len = decodeLen(rc, p, 1, posState)
            state = if (state < 7) 8 else 11
          }
        }
        if (len > 0) {
          val back = backOf(reps(0))
          if (back > dictBuf.n - dictStart || back > dictSize) throw Malformed
          if (dictBuf.n + len > limit) throw Malformed // overruns the chunk
          var i = 0
          while (i < len) {
            dictBuf.append(dictBuf.a(dictBuf.n - back.toInt))
            i += 1
          }
        }
      }
    }
    if (rc.pos != to || !rc.finished) throw Malformed // exact-consume rule
    state
  }

  /** Grow-only byte buffer exposing its backing array (the LZ window). */
  private[operators] final class GrowBuf {
    var a = new Array[Byte](1 << 12)
    var n = 0
    def append(b: Byte): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      a(n) = b; n += 1
    }
    def append(src: Array[Byte], off: Int, len: Int): Unit = {
      while (n + len > a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      System.arraycopy(src, off, a, n, len)
      n += len
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(a, n)
  }

  /** Decode an LZMA2 chunk sequence (a block's compressed data) into
    * bytes. Strict: first chunk must reset dict+props, every chunk
    * consumes exactly its packed bytes, the 0x00 terminator is
    * mandatory; returns (bytes, position after the terminator). */
  private[operators] def lzma2Decode(b: Array[Byte], from: Int, end: Int,
      dictSize: Long): (Array[Byte], Int) = {
    val buf = new GrowBuf
    var pos = from
    var dictStart = 0
    var probs: Probs = null
    var state = 0
    val reps = Array(0, 0, 0, 0)
    var needDictReset = true
    var needStateReset = true // first chunk, and after any uncompressed chunk
    var done = false
    while (!done) {
      if (pos >= end) throw Malformed
      val c = b(pos) & 0xff; pos += 1
      if (c == 0) done = true
      else if (c == 1 || c == 2) {
        if (c == 1) { dictStart = buf.n; needDictReset = false }
        else if (needDictReset) throw Malformed
        if (pos + 2 > end) throw Malformed
        val size = (((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff)) + 1
        pos += 2
        if (pos + size > end) throw Malformed
        buf.append(b, pos, size)
        pos += size
        // LZMA state may not continue across an uncompressed chunk
        needStateReset = true
      } else if (c >= 0x80) {
        if (pos + 4 > end) throw Malformed
        val unpacked = ((c & 0x1f) << 16 | (b(pos) & 0xff) << 8 | (b(pos + 1) & 0xff)) + 1
        val packed = ((b(pos + 2) & 0xff) << 8 | (b(pos + 3) & 0xff)) + 1
        pos += 4
        val mode = (c >> 5) & 3
        if (needDictReset && mode != 3) throw Malformed
        if (needStateReset && mode < 1) throw Malformed
        if (mode >= 2) {
          if (pos >= end) throw Malformed
          val (lc, lp, pb) = propsOf(b(pos) & 0xff); pos += 1
          probs = new Probs(lc, lp, pb)
        } else if (mode == 1) {
          if (probs == null) throw Malformed
          probs = new Probs(probs.lc, probs.lp, probs.pb)
        } else if (probs == null) throw Malformed
        if (mode >= 1) {
          state = 0; reps(0) = 0; reps(1) = 0; reps(2) = 0; reps(3) = 0
        }
        if (mode == 3) { dictStart = buf.n; needDictReset = false }
        needStateReset = false
        if (pos + packed > end) throw Malformed
        state = lzmaChunk(b, pos, pos + packed, buf, dictStart,
          unpacked, probs, state, reps, dictSize)
        pos += packed
      } else throw Malformed
    }
    (buf.result(), pos)
  }

  // -------------------------------------------------------- LZMA encoder

  private final class RangeEnc {
    val out = new java.io.ByteArrayOutputStream(256)
    private var low = 0L
    private var range = 0xFFFFFFFFL
    private var cache = 0
    private var cacheSize = 1L
    private def shiftLow(): Unit = {
      if (low < 0xFF000000L || low > 0xFFFFFFFFL) {
        var temp = cache
        var go = true
        while (go) {
          out.write(((temp + (low >>> 32)) & 0xff).toInt)
          temp = 0xFF
          cacheSize -= 1
          go = cacheSize != 0
        }
        cache = ((low >>> 24) & 0xff).toInt
      }
      cacheSize += 1
      low = (low << 8) & 0xFFFFFFFFL
    }
    def bit(probs: Array[Int], i: Int, b: Int): Unit = {
      val p = probs(i)
      val bound = (range >>> 11) * p
      if (b == 0) {
        range = bound
        probs(i) = p + ((2048 - p) >> 5)
      } else {
        low += bound
        range -= bound
        probs(i) = p - (p >> 5)
      }
      while (range < 0x1000000L) { range <<= 8; shiftLow() }
    }
    def direct(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        range = range >>> 1
        if (((v >>> i) & 1) == 1) low += range
        while (range < 0x1000000L) { range <<= 8; shiftLow() }
        i -= 1
      }
    }
    def tree(probs: Array[Int], off: Int, nbits: Int, sym: Int): Unit = {
      var m = 1
      var i = nbits - 1
      while (i >= 0) {
        val b = (sym >>> i) & 1
        bit(probs, off + m, b)
        m = (m << 1) | b
        i -= 1
      }
    }
    def reverseTree(probs: Array[Int], off: Int, nbits: Int, sym: Int): Unit = {
      var m = 1
      var i = 0
      while (i < nbits) {
        val b = (sym >>> i) & 1
        bit(probs, off + m, b)
        m = (m << 1) | b
        i += 1
      }
    }
    def flush(): Array[Byte] = {
      var i = 0
      while (i < 5) { shiftLow(); i += 1 }
      out.toByteArray
    }
  }

  private def encodeLen(rc: RangeEnc, p: Probs, which: Int, posState: Int,
      len0: Int): Unit = {
    val len = len0 - MATCH_LEN_MIN
    if (len < 8) {
      rc.bit(p.lenChoice, which * 2, 0)
      rc.tree(p.lenLow, (which * 16 + posState) * 8, 3, len)
    } else if (len < 16) {
      rc.bit(p.lenChoice, which * 2, 1)
      rc.bit(p.lenChoice, which * 2 + 1, 0)
      rc.tree(p.lenMid, (which * 16 + posState) * 8, 3, len - 8)
    } else {
      rc.bit(p.lenChoice, which * 2, 1)
      rc.bit(p.lenChoice, which * 2 + 1, 1)
      rc.tree(p.lenHigh, which * 256, 8, len - 16)
    }
  }

  /** LZMA-encode one chunk (lc=3, lp=0, pb=2), literals + greedy
    * hash-chain matches, mirroring the decoder's state machine
    * (including the matched-literal path after matches). */
  private[operators] def lzmaEncodeChunk(src: Array[Byte], from: Int,
      to: Int): Array[Byte] = {
    val p = new Probs(3, 0, 2)
    val rc = new RangeEnc
    var state = 0
    val reps = Array(0, 0, 0, 0)
    val HASH_BITS = 14
    val head = Array.fill(1 << HASH_BITS)(-1)
    def h3(i: Int): Int = {
      val v = ((src(i) & 0xff) << 16) | ((src(i + 1) & 0xff) << 8) | (src(i + 2) & 0xff)
      (v * -1640531535) >>> (32 - HASH_BITS)
    }
    var i = from
    while (i < to) {
      val totalPos = i - from
      val posState = totalPos & p.pbMask
      // greedy match probe
      var mLen = 0
      var mDist = 0
      if (i + 3 <= to) {
        val hh = h3(i)
        val cand = head(hh)
        head(hh) = i
        if (cand >= from && cand < i && i - cand <= (1 << 20)) {
          var l = 0
          val maxL = math.min(273, to - i)
          while (l < maxL && src(cand + l) == src(i + l)) l += 1
          if (l >= 3) { mLen = l; mDist = i - cand - 1 }
        }
      }
      if (mLen >= 3) {
        rc.bit(p.isMatch, (state << 4) + posState, 1)
        rc.bit(p.isRep, state, 0)
        reps(3) = reps(2); reps(2) = reps(1); reps(1) = reps(0); reps(0) = mDist
        encodeLen(rc, p, 0, posState, mLen)
        state = if (state < 7) 7 else 10
        val lps = math.min(mLen - 2, 3)
        val slot =
          if (mDist < 4) mDist
          else {
            val msb = 31 - Integer.numberOfLeadingZeros(mDist)
            (msb << 1) | ((mDist >>> (msb - 1)) & 1)
          }
        rc.tree(p.posSlot, lps * 64, 6, slot)
        if (slot >= 4) {
          val footer = (slot >> 1) - 1
          val base = (2 | (slot & 1)) << footer
          val rest = mDist - base
          if (slot < 14) rc.reverseTree(p.specialPos, base - slot - 1, footer, rest)
          else {
            rc.direct(rest >>> 4, footer - 4)
            rc.reverseTree(p.align, 0, 4, rest & 15)
          }
        }
        // index the skipped positions so later matches can land
        var k = i + 1
        val stop = math.min(i + mLen, to - 3)
        while (k < stop) { head(h3(k)) = k; k += 1 }
        i += mLen
      } else {
        rc.bit(p.isMatch, (state << 4) + posState, 0)
        val prev = if (totalPos == 0) 0 else src(i - 1) & 0xff
        val ctx = ((totalPos & p.lpMask) << p.lc) + (prev >>> (8 - p.lc))
        val off = 0x300 * ctx
        val sym = src(i) & 0xff
        if (state < 7) {
          var m = 1
          var bitIdx = 7
          while (bitIdx >= 0) {
            val b = (sym >>> bitIdx) & 1
            rc.bit(p.literals, off + m, b)
            m = (m << 1) | b
            bitIdx -= 1
          }
        } else {
          var matchByte = src(i - reps(0) - 1) & 0xff
          var m = 1
          var bitIdx = 7
          var broken = false
          while (bitIdx >= 0) {
            val b = (sym >>> bitIdx) & 1
            if (!broken) {
              val matchBit = (matchByte >> 7) & 1
              matchByte <<= 1
              rc.bit(p.literals, off + ((1 + matchBit) << 8) + m, b)
              if (matchBit != b) broken = true
            } else rc.bit(p.literals, off + m, b)
            m = (m << 1) | b
            bitIdx -= 1
          }
        }
        state = if (state < 4) 0 else if (state < 10) state - 3 else state - 6
        i += 1
      }
    }
    rc.flush()
  }

  /** LZMA2-encode: ≤40 KiB chunks, each with a full reset (mode 3,
    * props 0x5D = lc3/lp0/pb2), uncompressed chunks when coding does
    * not pay, the mandatory 0x00 terminator. */
  private[operators] def lzma2Encode(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(src.length / 2 + 64)
    val CHUNK = 40960
    var at = 0
    if (src.length == 0) { out.write(0); return out.toByteArray }
    while (at < src.length) {
      val n = math.min(CHUNK, src.length - at)
      val packed = lzmaEncodeChunk(src, at, at + n)
      if (packed.length + 1 < n && packed.length <= 65536) {
        val ctrl = 0x80 | (3 << 5) | ((n - 1) >>> 16)
        out.write(ctrl)
        out.write(((n - 1) >>> 8) & 0xff); out.write((n - 1) & 0xff)
        out.write((packed.length - 1) >>> 8); out.write((packed.length - 1) & 0xff)
        out.write(0x5D) // lc=3 lp=0 pb=2
        out.write(packed, 0, packed.length)
      } else {
        out.write(1) // uncompressed, dict reset: chunks stay independent
        out.write((n - 1) >>> 8); out.write((n - 1) & 0xff)
        out.write(src, at, n)
      }
      at += n
    }
    out.write(0)
    out.toByteArray
  }
}

/** The XZ container over LZMA2, both directions. */
object XzCodec {
  import XzLzma.{Malformed, crc64}

  private def crc32(b: Array[Byte], from: Int, to: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(b, from, to - from)
    c.getValue
  }

  val CHECK_NONE = 0
  val CHECK_CRC32 = 1
  val CHECK_CRC64 = 4

  private val MAGIC = Array[Byte](0xFD.toByte, '7', 'z', 'X', 'Z', 0)

  // XZ multibyte integers: little-endian 7-bit groups, ≤9 bytes, and
  // MINIMAL (the spec forbids a zero most-significant byte)
  private def writeMulti(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def readMulti(b: Array[Byte], pos0: Int, end: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var pos = pos0
    var last = 0
    while (true) {
      if (pos >= end || shift > 62) throw Malformed
      val x = b(pos) & 0xff; pos += 1
      last = x
      v |= (x & 0x7fL) << shift
      if ((x & 0x80) == 0) {
        if (last == 0 && shift != 0) throw Malformed // non-minimal
        return (v, pos)
      }
      shift += 7
    }
    (v, pos)
  }

  private def le32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
    out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
  }
  private def rdLe32(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
  private def rdLe64(b: Array[Byte], at: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(at + i) & 0xffL); i -= 1 }
    v
  }

  private val DICT_CODE = 16 // (2|0) << (16/2 + 11) = 1 MiB

  private def dictSizeOf(code: Int): Long = {
    if (code > 40) throw Malformed
    if (code == 40) 0xFFFFFFFFL
    else (2L | (code & 1)) << (code / 2 + 11)
  }

  /** Encode `content` as an XZ stream of `nBlocks` blocks. `indexLie`
    * bumps the first index record's uncompressed size WITH the index
    * CRC32 recomputed — every block intact, only the index-vs-blocks
    * cross-check catches it (the d123 lying-table discipline). */
  def encode(content: Array[Byte], nBlocks: Int, checkType: Int,
      indexLie: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(content.length / 2 + 256)
    out.write(MAGIC, 0, 6)
    val flags = Array[Byte](0, checkType.toByte)
    out.write(flags, 0, 2)
    le32(out, crc32(flags, 0, 2))

    val cuts = (0 to nBlocks).map(i => i * content.length / nBlocks)
    val records = Seq.newBuilder[(Long, Long)]
    cuts.sliding(2).foreach { w =>
      val part = java.util.Arrays.copyOfRange(content, w(0), w(1))
      // block header: 1 filter (LZMA2), no optional sizes
      val hdr = new java.io.ByteArrayOutputStream(12)
      hdr.write(0) // placeholder size byte
      hdr.write(0) // block flags: 1 filter, no size fields
      writeMulti(hdr, 0x21L) // LZMA2
      writeMulti(hdr, 1L) // properties size
      hdr.write(DICT_CODE)
      while ((hdr.size() + 4) % 4 != 0) hdr.write(0)
      val hb = hdr.toByteArray
      hb(0) = ((hb.length + 4) / 4 - 1).toByte
      out.write(hb, 0, hb.length)
      le32(out, crc32(hb, 0, hb.length))
      val headerSize = hb.length + 4

      val data = XzLzma.lzma2Encode(part)
      out.write(data, 0, data.length)
      var padded = data.length
      while (padded % 4 != 0) { out.write(0); padded += 1 }
      val checkLen = checkType match {
        case CHECK_NONE => 0
        case CHECK_CRC32 => le32(out, crc32(part, 0, part.length)); 4
        case CHECK_CRC64 =>
          val c = crc64(part, 0, part.length)
          var i = 0
          while (i < 8) { out.write(((c >>> (8 * i)) & 0xff).toInt); i += 1 }
          8
        case _ => throw Malformed
      }
      records += ((headerSize.toLong + data.length + checkLen, part.length.toLong))
    }

    val index = new java.io.ByteArrayOutputStream(64)
    index.write(0) // indicator
    writeMulti(index, nBlocks.toLong)
    records.result().zipWithIndex.foreach { case ((unpadded, uncomp), i) =>
      writeMulti(index, unpadded)
      writeMulti(index, if (indexLie && i == 0) uncomp + 1 else uncomp)
    }
    while ((index.size() + 4) % 4 != 0) index.write(0)
    val ib = index.toByteArray
    out.write(ib, 0, ib.length)
    le32(out, crc32(ib, 0, ib.length))
    val indexSize = ib.length + 4

    val tail = new java.io.ByteArrayOutputStream(6)
    le32(tail, indexSize.toLong / 4 - 1)
    tail.write(flags, 0, 2)
    val tb = tail.toByteArray
    le32(out, crc32(tb, 0, tb.length))
    out.write(tb, 0, tb.length)
    out.write('Y'); out.write('Z')
    out.toByteArray
  }

  /** Strict decode of one XZ stream: every CRC, every padding byte,
    * the index cross-checked against the blocks actually walked, the
    * footer's backward size and flag copy. Returns (content, nBlocks). */
  def decode(b: Array[Byte]): Option[(Array[Byte], Int)] =
    try {
      if (b.length < 32) throw Malformed
      var i = 0
      while (i < 6) { if (b(i) != MAGIC(i)) throw Malformed; i += 1 }
      if (b(6) != 0) throw Malformed
      val checkType = b(7) & 0xff
      val checkLen = checkType match {
        case CHECK_NONE => 0
        case CHECK_CRC32 => 4
        case CHECK_CRC64 => 8
        case _ => throw Malformed // SHA-256 and reserved: out of scope
      }
      if (rdLe32(b, 8) != crc32(b, 6, 8)) throw Malformed
      var pos = 12
      val outBuf = new java.io.ByteArrayOutputStream(b.length * 2)
      val walked = Seq.newBuilder[(Long, Long)]
      var nBlocks = 0
      while (pos < b.length && b(pos) != 0) {
        val blockStart = pos
        val headerSize = ((b(pos) & 0xff) + 1) * 4
        if (headerSize < 8 || pos + headerSize > b.length) throw Malformed
        val hEnd = pos + headerSize - 4
        if (rdLe32(b, hEnd) != crc32(b, pos, hEnd)) throw Malformed
        val bflags = b(pos + 1) & 0xff
        if ((bflags & 0x3c) != 0) throw Malformed // reserved bits
        val nFilters = (bflags & 3) + 1
        val hasComp = (bflags & 0x40) != 0
        val hasUncomp = (bflags & 0x80) != 0
        var hp = pos + 2
        var declComp = -1L
        var declUncomp = -1L
        if (hasComp) { val (v, np) = readMulti(b, hp, hEnd); declComp = v; hp = np }
        if (hasUncomp) { val (v, np) = readMulti(b, hp, hEnd); declUncomp = v; hp = np }
        if (nFilters != 1) throw Malformed // LZMA2 is always the last, only
        val (fid, np1) = readMulti(b, hp, hEnd); hp = np1
        if (fid != 0x21) throw Malformed
        val (psz, np2) = readMulti(b, hp, hEnd); hp = np2
        if (psz != 1 || hp >= hEnd) throw Malformed
        val dictSize = dictSizeOf(b(hp) & 0xff); hp += 1
        while (hp < hEnd) { if (b(hp) != 0) throw Malformed; hp += 1 }

        val dataStart = pos + headerSize
        val (part, afterData) = XzLzma.lzma2Decode(b, dataStart, b.length, dictSize)
        val compLen = afterData - dataStart
        if (declComp >= 0 && declComp != compLen) throw Malformed
        if (declUncomp >= 0 && declUncomp != part.length) throw Malformed
        pos = afterData
        while (pos % 4 != 0) {
          if (pos >= b.length || b(pos) != 0) throw Malformed
          pos += 1
        }
        if (pos + checkLen > b.length) throw Malformed
        checkType match {
          case CHECK_CRC32 =>
            if (rdLe32(b, pos) != crc32(part, 0, part.length)) throw Malformed
          case CHECK_CRC64 =>
            if (rdLe64(b, pos) != crc64(part, 0, part.length)) throw Malformed
          case _ => ()
        }
        pos += checkLen
        outBuf.write(part, 0, part.length)
        walked += ((headerSize.toLong + compLen + checkLen, part.length.toLong))
        nBlocks += 1
        val _ = blockStart
      }

      // the index: one record per block, CROSS-CHECKED
      if (pos >= b.length || b(pos) != 0) throw Malformed
      val indexStart = pos
      pos += 1
      val (cnt, np) = readMulti(b, pos, b.length); pos = np
      val actual = walked.result()
      if (cnt != actual.length) throw Malformed
      actual.foreach { case (unpadded, uncomp) =>
        val (u1, p1) = readMulti(b, pos, b.length); pos = p1
        val (u2, p2) = readMulti(b, pos, b.length); pos = p2
        if (u1 != unpadded || u2 != uncomp) throw Malformed // the lying index
      }
      while ((pos - indexStart) % 4 != 0) {
        if (pos >= b.length || b(pos) != 0) throw Malformed
        pos += 1
      }
      if (pos + 4 > b.length) throw Malformed
      if (rdLe32(b, pos) != crc32(b, indexStart, pos)) throw Malformed
      pos += 4
      val indexSize = pos - indexStart

      // stream footer
      if (pos + 12 > b.length) throw Malformed
      if (rdLe32(b, pos) != crc32(b, pos + 4, pos + 10)) throw Malformed
      if (rdLe32(b, pos + 4) != indexSize.toLong / 4 - 1) throw Malformed
      if (b(pos + 8) != 0 || (b(pos + 9) & 0xff) != checkType) throw Malformed
      if (b(pos + 10) != 'Y' || b(pos + 11) != 'Z') throw Malformed
      if (pos + 12 != b.length) throw Malformed // no trailing garbage
      Some((outBuf.toByteArray, nBlocks))
    } catch {
      case XzLzma.Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
}

/** In-plan synthesizer + gate for d134 — `.jsonl.xz` (the d119
  * symmetry at the OTHER dump codec): the doc's lines as JSONL
  * records, XZ-compressed through OUR LZMA2 encoder; docs with
  * doc_id%5==2 carry TWO blocks (the index then has two records);
  * the check rotates CRC32 / CRC64 by doc_id%2 (NONE is spec-pinned).
  * Damage %7: truncation / a LYING INDEX RECORD (uncompressed size
  * +1, index CRC32 recomputed — every block byte intact and every
  * check passes; only the index-vs-walked cross-check catches it) /
  * one bit flipped in the block's data check field. */
object XzJsonlSim {

  private[graft] def jsonlBytes(docId: Long, text: String): Array[Byte] =
    text.split("\n", -1).zipWithIndex.map { case (l, k) =>
      s"""{"id":${docId * 1000 + k},"text":"${ZstdJsonlSim.escape(l)}"}"""
    }.mkString("\n").getBytes("UTF-8")

  private[graft] def nBlocks(docId: Long): Int = if (docId % 5 == 2) 2 else 1

  private[graft] def checkType(docId: Long): Int =
    if (docId % 2 == 0) XzCodec.CHECK_CRC32 else XzCodec.CHECK_CRC64

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val blob = jsonlBytes(docId, text)
    (docId % 7) match {
      case 0 =>
        val clean = XzCodec.encode(blob, nBlocks(docId), checkType(docId))
        java.util.Arrays.copyOf(clean, clean.length - 3)
      case 3 =>
        XzCodec.encode(blob, nBlocks(docId), checkType(docId), indexLie = true)
      case 5 =>
        val d = XzCodec.encode(blob, nBlocks(docId), checkType(docId))
        // the block check field sits right before the index indicator:
        // find the index start from the footer's backward size
        val indexSize = ((d(d.length - 8) & 0xffL) | ((d(d.length - 7) & 0xffL) << 8) |
          ((d(d.length - 6) & 0xffL) << 16) | ((d(d.length - 5) & 0xffL) << 24)) * 4 + 4
        val checkFieldEnd = d.length - 12 - indexSize.toInt
        d(checkFieldEnd - 1) = (d(checkFieldEnd - 1) ^ 0x10).toByte
        d
      case _ => XzCodec.encode(blob, nBlocks(docId), checkType(docId))
    }
  }

  val lineSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_blocks", LongType),
    StructField("line", StringType)))

  /** The row source: strict XZ decode → one row per JSONL line.
    * Map-only flatMap; damaged payloads yield nothing. */
  def lines(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(lineSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            XzCodec.decode(payloadFor(id, r.getString(1))) match {
              case Some((blob, blocks)) =>
                new String(blob, "UTF-8").split("\n", -1).toSeq
                  .map(l => Row(id, blocks.toLong, l))
              case None => Nil
            }
          }
        }
      }(enc)
  }
}
