package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet file walk for the d126 gate — the warehouse's OWN format,
  * the one every 100 TB scan depends on, implemented from the
  * published format spec (parquet-format: thrift compact protocol,
  * page layout, RLE/bit-packed hybrid) in BOTH directions:
  *
  *  - a from-scratch THRIFT COMPACT reader (generic struct walk —
  *    unknown fields skip structurally, so future footer fields can't
  *    break the parse) and writer (field deltas, zigzag varints,
  *    list/struct headers);
  *  - the FILE grammar: PAR1 magic both ends, footer length, the
  *    FileMetaData → RowGroup → ColumnChunk → ColumnMetaData chain;
  *  - the PAGE walk: PageHeader per page, dictionary pages (PLAIN) +
  *    data pages v1 (definition levels as the length-prefixed
  *    RLE/bit-packed hybrid, PLAIN or RLE_DICTIONARY values);
  *  - page decompression through OUR OWN codecs — UNCOMPRESSED,
  *    SNAPPY (d122's block codec), GZIP (d106's member walk), ZSTD
  *    (d117's frame decoder) — the gate rotates all four, so every
  *    entropy layer in the repo runs inside the warehouse format;
  *  - the STATS AUDIT (the d123 lying-table discipline): declared
  *    per-chunk min_value/max_value/null_count are VERIFIED against
  *    values recomputed from the pages themselves — a footer that
  *    lies about its statistics would silently un-prune or mis-prune
  *    a 100 TB scan, so a lie QUARANTINES the file. Declared
  *    num_values must match the walked count exactly; page sizes,
  *    level runs and value byte counts must tile each page exactly.
  *
  * Interop pinned BOTH directions against Spark's own parquet
  * (parquet-mr): Spark-written files (dictionary encoding, real page
  * splits, all four codecs) walk through our reader with the audit
  * passing, and our writer's files read back row-identical through
  * spark.read.parquet (spec suite).
  */
object ParquetCodec {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ------------------------------------------------------ thrift compact

  private[graft] sealed trait TVal
  private[graft] final case class TBool(v: Boolean) extends TVal
  private[graft] final case class TI(v: Long) extends TVal
  private[graft] final case class TDouble(v: Double) extends TVal
  private[graft] final case class TBin(v: Array[Byte]) extends TVal
  private[graft] final case class TList(v: Seq[TVal]) extends TVal
  private[graft] final case class TStruct(f: Map[Int, TVal]) extends TVal

  private[graft] final class TReader(b: Array[Byte], var pos: Int, end: Int) {
    private def u8(): Int = {
      if (pos >= end) throw Malformed
      val v = b(pos) & 0xFF
      pos += 1
      v
    }
    private def varint(): Long = {
      var v = 0L
      var shift = 0
      var more = true
      while (more) {
        val x = u8()
        v |= (x & 0x7FL) << shift
        shift += 7
        if (shift > 70) throw Malformed
        more = (x & 0x80) != 0
      }
      v
    }
    private def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    private def bin(): Array[Byte] = {
      val n = varint().toInt
      if (n < 0 || pos + n > end) throw Malformed
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
      out
    }
    private def value(tpe: Int): TVal = tpe match {
      case 1 => TBool(true)
      case 2 => TBool(false)
      case 3 => TI(u8().toByte.toLong) // i8: single raw byte
      case 4 | 5 | 6 => TI(zigzag())
      case 7 => // double: 8 bytes LE
        var v = 0L
        var i = 0
        while (i < 8) { v |= (u8().toLong << (8 * i)); i += 1 }
        TDouble(java.lang.Double.longBitsToDouble(v))
      case 8 => TBin(bin())
      case 9 | 10 => // list / set
        val h = u8()
        val et = h & 0xF
        val n = if ((h >>> 4) == 15) varint().toInt else h >>> 4
        if (n < 0 || n > (1 << 24)) throw Malformed
        // bool list ELEMENTS are one raw byte each (1/2) — unlike
        // bool FIELDS, whose value rides in the field-type nibble
        // (ColumnIndex.null_pages is a list<bool> — d175)
        if (et == 1 || et == 2)
          TList((0 until n).map(_ => u8() match {
            case 1 => TBool(true)
            case 2 => TBool(false)
            case _ => throw Malformed
          }))
        else TList((0 until n).map(_ => value(et)))
      case 11 => // map: varint size, then (if >0) key/value type byte + pairs
        val n = varint().toInt
        if (n < 0 || n > (1 << 22)) throw Malformed
        if (n == 0) TList(Nil)
        else {
          val kv = u8()
          TList((0 until n).flatMap(_ =>
            Seq(value((kv >>> 4) & 0xF), value(kv & 0xF))))
        }
      case 12 => struct()
      case _ => throw Malformed
    }
    def struct(): TStruct = {
      var last = 0
      val m = Map.newBuilder[Int, TVal]
      var stop = false
      while (!stop) {
        val h = u8()
        if (h == 0) stop = true
        else {
          val tpe = h & 0xF
          val delta = (h >>> 4) & 0xF
          val id = if (delta == 0) zigzag().toInt else last + delta
          last = id
          m += id -> value(tpe)
        }
      }
      TStruct(m.result())
    }
  }

  private[graft] final class TWriter {
    private val out = new java.io.ByteArrayOutputStream()
    def bytes: Array[Byte] = out.toByteArray
    private def u8(v: Int): Unit = out.write(v & 0xFF)
    private def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { u8(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      u8(v.toInt)
    }
    private def zigzag(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    /** One struct scope: emit fields in ascending id order. */
    final class S {
      private var last = 0
      private def header(id: Int, tpe: Int): Unit = {
        val delta = id - last
        if (delta >= 1 && delta <= 15) u8((delta << 4) | tpe)
        else { u8(tpe); zigzag(id.toLong) }
        last = id
      }
      def i32(id: Int, v: Long): Unit = { header(id, 5); zigzag(v) }
      def i64(id: Int, v: Long): Unit = { header(id, 6); zigzag(v) }
      def bool(id: Int, v: Boolean): Unit = header(id, if (v) 1 else 2)
      def bin(id: Int, v: Array[Byte]): Unit = {
        header(id, 8); varint(v.length.toLong); out.write(v, 0, v.length)
      }
      def str(id: Int, v: String): Unit = bin(id, v.getBytes("UTF-8"))
      def list(id: Int, elemType: Int, n: Int)(body: => Unit): Unit = {
        header(id, 9)
        if (n < 15) u8((n << 4) | elemType)
        else { u8(0xF0 | elemType); varint(n.toLong) }
        body
      }
      def structField(id: Int)(body: S => Unit): Unit = {
        header(id, 12); struct(body)
      }
      def stop(): Unit = u8(0)
    }
    def struct(body: S => Unit): Unit = {
      val s = new S
      body(s)
      s.stop()
    }
    /** A bare list ELEMENT that is itself a struct. */
    def structElem(body: S => Unit): Unit = struct(body)
    def i32Elem(v: Long): Unit = zigzag(v)
    def i64Elem(v: Long): Unit = zigzag(v)
    def boolElem(v: Boolean): Unit = u8(if (v) 1 else 2)
    def binElem(v: Array[Byte]): Unit = {
      varint(v.length.toLong); out.write(v, 0, v.length)
    }
  }

  // ------------------------------------------------- RLE/bit-packed hybrid

  /** Decode `count` values of `bitWidth` bits from the hybrid
    * encoding in b[pos, end). Returns (values, endPos). */
  private[graft] def rleHybrid(b: Array[Byte], pos0: Int, end: Int,
                               bitWidth: Int, count: Int): (Array[Int], Int) = {
    val out = new Array[Int](count)
    var n = 0
    var pos = pos0
    def u8(): Int = {
      if (pos >= end) throw Malformed
      val v = b(pos) & 0xFF
      pos += 1
      v
    }
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var more = true
      while (more) {
        val x = u8()
        v |= (x & 0x7FL) << shift
        shift += 7
        if (shift > 42) throw Malformed
        more = (x & 0x80) != 0
      }
      v
    }
    val byteW = (bitWidth + 7) / 8
    while (n < count) {
      val header = varint()
      if ((header & 1) == 0) { // RLE run
        val run = (header >>> 1).toInt
        if (run < 0 || n + run > count) throw Malformed
        var v = 0
        var i = 0
        while (i < byteW) { v |= u8() << (8 * i); i += 1 }
        if (bitWidth < 32 && (v >>> bitWidth) != 0) throw Malformed
        java.util.Arrays.fill(out, n, n + run, v)
        n += run
      } else { // bit-packed: groups of 8, LSB-first
        val groups = (header >>> 1).toInt
        if (groups <= 0 || groups > (count - n + 7) / 8) throw Malformed
        var acc = 0L
        var accBits = 0
        var produced = 0
        val total = groups * 8
        while (produced < total) {
          while (accBits < bitWidth) {
            acc |= u8().toLong << accBits
            accBits += 8
          }
          val v = (acc & ((1L << bitWidth) - 1)).toInt
          acc >>>= bitWidth
          accBits -= bitWidth
          if (n < count) { out(n) = v; n += 1 } // else: padding, undefined
          produced += 1
        }
      }
    }
    (out, pos)
  }

  /** Encode values (all of `bitWidth` bits) as ONE RLE run per
    * value-run (our writer's shape — levels are runs of 1s). */
  private[graft] def rleHybridEncode(values: Array[Int], bitWidth: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    val byteW = (bitWidth + 7) / 8
    var i = 0
    while (i < values.length) {
      val v = values(i)
      var run = 1
      while (i + run < values.length && values(i + run) == v) run += 1
      varint((run.toLong << 1))
      var k = 0
      while (k < byteW) { out.write((v >> (8 * k)) & 0xFF); k += 1 }
      i += run
    }
    out.toByteArray
  }

  // -------------------------------------------- DELTA_BINARY_PACKED (v2)

  /** DELTA_BINARY_PACKED (parquet Encodings.md): header (block size /
    * miniblocks per block / total count / zigzag first value), then
    * per block a zigzag min-delta, one bit-width byte per miniblock
    * (unused miniblocks keep their width byte but have NO body), and
    * LSB-first bit-packed adjusted deltas. Our writer emits the
    * canonical 128/4 geometry; the reader accepts any spec-legal one. */
  private[graft] def dbpEncode(vals: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(vals.length + 16)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def zigzag(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    val BLOCK = 128
    val MINIS = 4
    val VPM = BLOCK / MINIS // 32: any bit width stays byte-aligned
    varint(BLOCK.toLong); varint(MINIS.toLong)
    varint(vals.length.toLong)
    if (vals.isEmpty) return out.toByteArray
    zigzag(vals(0))
    val deltas = Array.tabulate(math.max(0, vals.length - 1))(i =>
      vals(i + 1) - vals(i))
    var at = 0
    while (at < deltas.length) {
      val n = math.min(BLOCK, deltas.length - at)
      var minD = Long.MaxValue
      var i = 0
      while (i < n) { minD = math.min(minD, deltas(at + i)); i += 1 }
      zigzag(minD)
      val widths = Array.tabulate(MINIS) { m =>
        val from = m * VPM
        if (from >= n) 0
        else {
          var w = 0
          var k = from
          while (k < math.min(from + VPM, n)) {
            val adj = deltas(at + k) - minD
            w = math.max(w, 64 - java.lang.Long.numberOfLeadingZeros(adj))
            k += 1
          }
          w
        }
      }
      widths.foreach(out.write)
      var m = 0
      while (m * VPM < n) {
        val w = widths(m)
        if (w > 0) {
          val body = new Array[Byte](VPM * w / 8)
          var k = 0
          while (k < VPM) {
            val idx = at + m * VPM + k
            val adj = if (m * VPM + k < n) deltas(idx) - minD else 0L
            var bit = 0
            while (bit < w) {
              if (((adj >>> bit) & 1) != 0) {
                val bp = k * w + bit
                body(bp / 8) = (body(bp / 8) | (1 << (bp % 8))).toByte
              }
              bit += 1
            }
            k += 1
          }
          out.write(body, 0, body.length)
        }
        m += 1
      }
      at += n
    }
    out.toByteArray
  }

  /** Decode exactly `count` DELTA_BINARY_PACKED values starting at
    * `pos`; returns (values, first byte after the encoding). */
  private[graft] def dbpDecode(b: Array[Byte], pos0: Int, end: Int,
      count: Int): (Array[Long], Int) = {
    var pos = pos0
    def varint(): Long = {
      var v = 0L
      var shift = 0
      while (true) {
        if (pos >= end || shift > 63) throw Malformed
        val x = b(pos); pos += 1
        v |= (x & 0x7FL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    val block = varint().toInt
    val minis = varint().toInt
    if (block <= 0 || minis <= 0 || block % minis != 0) throw Malformed
    val vpm = block / minis
    if (block % 128 != 0 || vpm % 32 != 0) throw Malformed // spec multiples
    val total = varint()
    if (total != count) throw Malformed // the page header must agree
    val out = new Array[Long](count)
    if (count == 0) return (out, pos)
    out(0) = zigzag()
    var got = 1
    while (got < count) {
      val minD = zigzag()
      val widths = new Array[Int](minis)
      var m = 0
      while (m < minis) {
        if (pos >= end) throw Malformed
        widths(m) = b(pos) & 0xFF
        if (widths(m) > 64) throw Malformed
        pos += 1
        m += 1
      }
      m = 0
      while (m < minis && got < count) {
        val w = widths(m)
        val bodyLen = vpm * w / 8
        if (pos + bodyLen > end) throw Malformed
        var k = 0
        while (k < vpm && got < count) {
          var adj = 0L
          var bit = 0
          while (bit < w) {
            val bp = k * w + bit
            if (((b(pos + bp / 8) >> (bp % 8)) & 1) != 0) adj |= 1L << bit
            bit += 1
          }
          out(got) = out(got - 1) + minD + adj
          got += 1
          k += 1
        }
        pos += bodyLen
        m += 1
      }
    }
    (out, pos)
  }

  // --------------------------------------- split-block bloom filter (SBBF)

  /** The parquet bloom filter (BloomFilter.md): 256-bit blocks of
    * eight 32-bit words, block picked by multiply-shift on the hash's
    * HIGH 32 bits, one bit per word from the LOW 32 bits times the
    * eight salt constants (top five bits = the bit index). Values
    * hash with xxHash64 seed 0 over their PLAIN encoding. */
  private[graft] object Sbbf {
    val SALT: Array[Int] = Array(0x47b6137b, 0x44974d91, 0x8824ad5b,
      0xa2b7289d.toInt, 0x705495c7, 0x2df1424b, 0x9efc4947.toInt, 0x5c6bfb31)

    private val xxf = net.jpountz.xxhash.XXHashFactory.fastestJavaInstance()

    def hashInt64(v: Long): Long = {
      val b = new Array[Byte](8)
      var i = 0
      while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
      xxf.hash64().hash(b, 0, 8, 0L)
    }

    def blockIdx(h: Long, nBlocks: Int): Int =
      (((h >>> 32) * nBlocks) >>> 32).toInt

    def insert(words: Array[Int], nBlocks: Int, h: Long): Unit = {
      val base = blockIdx(h, nBlocks) * 8
      val x = h.toInt
      var i = 0
      while (i < 8) {
        words(base + i) |= 1 << ((x * SALT(i)) >>> 27)
        i += 1
      }
    }

    def check(words: Array[Int], nBlocks: Int, h: Long): Boolean = {
      val base = blockIdx(h, nBlocks) * 8
      val x = h.toInt
      var i = 0
      var ok = true
      while (i < 8 && ok) {
        ok = (words(base + i) & (1 << ((x * SALT(i)) >>> 27))) != 0
        i += 1
      }
      ok
    }
  }
}

/** The file-level writer/reader over the thrift plumbing. Bounded
  * schema (the gate's): `doc_id INT64, val INT64, text BYTE_ARRAY
  * (UTF8)`, all OPTIONAL (Spark's nullable default), data pages v1,
  * PLAIN values from our writer; PLAIN + PLAIN_/RLE_DICTIONARY read. */
object ParquetFile {

  import ParquetCodec._

  private[operators] val MAGIC = "PAR1".getBytes("US-ASCII")

  // parquet enums (parquet-format)
  private val T_INT64 = 2
  private val T_FLOAT = 4
  private val T_BYTE_ARRAY = 6
  private val ENC_PLAIN = 0
  private val ENC_PLAIN_DICT = 2
  private val ENC_RLE = 3
  private val ENC_RLE_DICT = 8
  private val ENC_DELTA_BINARY_PACKED = 5
  private val ENC_DELTA_LENGTH_BYTE_ARRAY = 6
  private val ENC_DELTA_BYTE_ARRAY = 7

  private def le32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }
  private def le64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    le32(out, (v & 0xFFFFFFFFL).toInt); le32(out, (v >>> 32).toInt)
  }
  private def le64bytes(v: Long): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream(8); le64(o, v); o.toByteArray
  }

  private def compress(codec: Int, raw: Array[Byte]): Array[Byte] = codec match {
    case 0 => raw
    case 1 => SnappyCodec.compressBlock(raw)
    case 2 => GzipCodec.gzipMember(raw)
    case 6 => ZstdCodec.encodeFrame(raw, math.max(1, raw.length))
    case _ => throw Malformed
  }

  private def decompress(codec: Int, b: Array[Byte], from: Int, to: Int,
                         expect: Int): Array[Byte] = {
    if (from < 0 || to > b.length || from > to) throw Malformed
    val part = java.util.Arrays.copyOfRange(b, from, to)
    val out = codec match {
      case 0 => part
      case 1 => try SnappyCodec.decompressBlock(part, 0, part.length)
        catch { case _: Exception => throw Malformed }
      case 2 => GzipCodec.decode(part) match {
        case Some(ms) if ms.length == 1 => ms.head
        case _ => throw Malformed
      }
      case 6 => ZstdCodec.decodeLoose(part).getOrElse(throw Malformed)
      case _ => throw Malformed
    }
    if (out.length != expect) throw Malformed
    out
  }

  /** Render one v1 data page: header (thrift) + body ([4-byte len]
    * [def-level hybrid][PLAIN values]), compressed through `codec`.
    * `declared` lets the %7==5 damage lie about num_values. Returns
    * (page bytes, uncompressed size incl. header — the spec's
    * total_uncompressed_size convention). */
  /** Page CRC (PageHeader field 4): per the format spec, CRC32 over
    * the page's serialized data as written, EXCLUDING the header —
    * stored as the signed i32 parquet-mr writes. */
  private def pageCrc(data: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32
    c.update(data, 0, data.length)
    c.getValue.toInt
  }

  private def dataPage(codec: Int, actual: Int, declared: Int,
                       values: Array[Byte]): (Array[Byte], Long) = {
    val levels = rleHybridEncode(Array.fill(actual)(1), 1)
    val body = new java.io.ByteArrayOutputStream(values.length + 16)
    le32(body, levels.length)
    body.write(levels, 0, levels.length)
    body.write(values, 0, values.length)
    val raw = body.toByteArray
    val comp = compress(codec, raw)
    val w = new TWriter
    w.struct { s =>
      s.i32(1, 0) // type: DATA_PAGE
      s.i32(2, raw.length.toLong)
      s.i32(3, comp.length.toLong)
      s.i32(4, pageCrc(comp).toLong) // page CRC (spec: data sans header)
      s.structField(5) { d =>
        d.i32(1, declared.toLong)
        d.i32(2, ENC_PLAIN.toLong)
        d.i32(3, ENC_RLE.toLong)
        d.i32(4, ENC_RLE.toLong)
      }
    }
    val hdr = w.bytes
    val out = new java.io.ByteArrayOutputStream(comp.length + hdr.length)
    out.write(hdr, 0, hdr.length)
    out.write(comp, 0, comp.length)
    (out.toByteArray, (raw.length + hdr.length).toLong)
  }

  /** Render one V2 data page (d135): header field 8 (DataPageHeaderV2),
    * def levels OUTSIDE the compressed region with NO length prefix
    * (their byte length lives in the header — the v1/v2 difference the
    * operator exists to cover), data section DELTA-encoded.
    * `declaredNulls` lets the %7==5 damage lie about num_nulls — the
    * v2-specific header field only the level audit catches. */
  private def dataPageV2(codec: Int, actual: Int, declaredNulls: Int,
                         enc: Int, data: Array[Byte]): (Array[Byte], Long) = {
    val levels = ParquetCodec.rleHybridEncode(Array.fill(actual)(1), 1)
    val comp = compress(codec, data)
    val w = new TWriter
    w.struct { s =>
      s.i32(1, 3) // type: DATA_PAGE_V2
      s.i32(2, (levels.length + data.length).toLong)
      s.i32(3, (levels.length + comp.length).toLong)
      s.i32(4, pageCrc(levels ++ comp).toLong) // CRC: data as written
      s.structField(8) { d =>
        d.i32(1, actual.toLong) // num_values
        d.i32(2, declaredNulls.toLong) // num_nulls
        d.i32(3, actual.toLong) // num_rows
        d.i32(4, enc.toLong)
        d.i32(5, levels.length.toLong) // definition_levels_byte_length
        d.i32(6, 0L) // repetition_levels_byte_length
        d.bool(7, codec != 0) // is_compressed
      }
    }
    val hdr = w.bytes
    val out = new java.io.ByteArrayOutputStream(comp.length + hdr.length)
    out.write(hdr, 0, hdr.length)
    out.write(levels, 0, levels.length)
    out.write(comp, 0, comp.length)
    (out.toByteArray,
      (hdr.length + levels.length + data.length).toLong)
  }

  /** Write the v2 twin of [[write]]: same bounded schema and footer,
    * data pages v2 with the DELTA encodings — ids/vals
    * DELTA_BINARY_PACKED, text DELTA_BYTE_ARRAY (prefix lengths +
    * suffix lengths as inner DBP runs + suffix bytes). */
  private[graft] def writeV2(rows: Seq[(Long, Long, String)], rowGroupCut: Int,
                             codec: Int, lieStats: Boolean = false,
                             lieNumNulls: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    out.write(MAGIC, 0, 4)
    val groups = rows.grouped(rowGroupCut).toSeq
    val rgMeta = groups.zipWithIndex.map { case (g, gi) =>
      val cols = Seq(("doc_id", T_INT64), ("val", T_INT64),
        ("text", T_BYTE_ARRAY)).map { case (name, tpe) =>
        var sMin = Long.MaxValue
        var sMax = Long.MinValue
        val (enc, data) =
          if (tpe == T_INT64) {
            val vs = g.map { case (id, v, _) =>
              val x = if (name == "doc_id") id else v
              if (x < sMin) sMin = x
              if (x > sMax) sMax = x
              x
            }.toArray
            (ENC_DELTA_BINARY_PACKED, ParquetCodec.dbpEncode(vs))
          } else {
            val bs = g.map(_._3.getBytes("UTF-8"))
            val prefixes = bs.zipWithIndex.map { case (cur, i) =>
              if (i == 0) 0L
              else {
                val prev = bs(i - 1)
                var p = 0
                val lim = math.min(prev.length, cur.length)
                while (p < lim && prev(p) == cur(p)) p += 1
                p.toLong
              }
            }.toArray
            val sufLens = bs.zipWithIndex.map { case (cur, i) =>
              cur.length - prefixes(i).toInt
            }
            val body = new java.io.ByteArrayOutputStream()
            val pfx = ParquetCodec.dbpEncode(prefixes)
            val sfl = ParquetCodec.dbpEncode(sufLens.map(_.toLong).toArray)
            body.write(pfx, 0, pfx.length)
            body.write(sfl, 0, sfl.length)
            bs.zipWithIndex.foreach { case (cur, i) =>
              body.write(cur, prefixes(i).toInt, sufLens(i))
            }
            (ENC_DELTA_BYTE_ARRAY, body.toByteArray)
          }
        val nullsDecl = if (lieNumNulls && gi == 0 && name == "doc_id") 1 else 0
        val (page, uncomp) = dataPageV2(codec, g.length, nullsDecl, enc, data)
        val declMax = if (lieStats && gi == 0 && name == "val") sMax - 1
          else sMax
        Chunk(page, uncomp, tpe, name, g.length.toLong,
          if (tpe == T_INT64 && g.nonEmpty) Some((sMin, declMax)) else None)
      }
      val offs = cols.map { c =>
        val o = out.size().toLong
        out.write(c.bytes, 0, c.bytes.length)
        (o, None: Option[(Long, Int)])
      }
      (g.length.toLong, cols.zip(offs))
    }
    writeFooter(out, rows.length.toLong, rgMeta, codec)
    out.toByteArray
  }

  /** One logical row of the d171 nested table: a required int64 id
    * and an `array<float>` column — None = null list, Some(elems)
    * with None elements = null entries (the full definition ladder). */
  private[graft] type NestedRow = (Long, Option[Seq[Option[Float]]])

  private def le32f(v: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToIntBits(v)
    Array((bits & 0xFF).toByte, ((bits >> 8) & 0xFF).toByte,
      ((bits >> 16) & 0xFF).toByte, ((bits >> 24) & 0xFF).toByte)
  }

  /** Write the d171 nested file: (doc_id int64, emb array<float>) with
    * the standard 3-level LIST layout Spark writes — optional group
    * emb (LIST) { repeated group list { optional float element } },
    * max_def 3 / max_rep 1 — one page per chunk per row group,
    * v1 pages ([len][rep RLE][len][def RLE][PLAIN floats]) or v2
    * (levels outside the compressed region, lengths in the header).
    * `lieStats` fakes the first row group's element max_value one
    * quarter low (the d126 audit class through the nested column);
    * `lieRows` declares the first emb v2 page's num_rows one high
    * (the STRUCTURAL lie — a wrong row count re-chunks every list;
    * only the repetition-level audit catches it) or, through v1
    * pages, inflates the chunk's declared num_values (the level
    * sections no longer tile). */
  private[graft] def writeNested(rows: Seq[NestedRow], rowGroupCut: Int,
                                 codec: Int, v2: Boolean,
                                 lieStats: Boolean = false,
                                 lieRows: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    out.write(MAGIC, 0, 4)
    val groups = rows.grouped(rowGroupCut).toSeq
    // the stats lie must target a row group that HAS float values —
    // a group of only null/empty lists writes no stats to lie about
    val lieGi = groups.indexWhere(_.exists(_._2.exists(_.exists(_.isDefined))))
    val rgMeta = groups.zipWithIndex.map { case (g, gi) =>
      // ---- doc_id: required flat int64, PLAIN (no level sections)
      val idVals = new java.io.ByteArrayOutputStream(8 * g.length)
      var idMin = Long.MaxValue
      var idMax = Long.MinValue
      g.foreach { case (id, _) =>
        idVals.write(le64bytes(id), 0, 8)
        if (id < idMin) idMin = id
        if (id > idMax) idMax = id
      }
      val idPage = if (v2)
        dataPageV2Req(codec, g.length, idVals.toByteArray)
      else dataPageReq(codec, g.length, idVals.toByteArray)
      // ---- emb: the level ladder
      val reps = Array.newBuilder[Int]
      val defs = Array.newBuilder[Int]
      val vals = new java.io.ByteArrayOutputStream(64)
      var slots = 0
      var present = 0
      var fMin = Float.MaxValue
      var fMax = Float.MinValue
      g.foreach { case (_, emb) =>
        emb match {
          case None => reps += 0; defs += 0; slots += 1
          case Some(Nil) => reps += 0; defs += 1; slots += 1
          case Some(elems) =>
            elems.zipWithIndex.foreach { case (e, j) =>
              reps += (if (j == 0) 0 else 1)
              slots += 1
              e match {
                case None => defs += 2
                case Some(v) =>
                  defs += 3
                  present += 1
                  vals.write(le32f(v), 0, 4)
                  if (v < fMin) fMin = v
                  if (v > fMax) fMax = v
              }
            }
        }
      }
      val repB = ParquetCodec.rleHybridEncode(reps.result(), 1)
      val defB = ParquetCodec.rleHybridEncode(defs.result(), 2)
      val declaredSlots =
        if (lieRows && gi == 0 && !v2) slots + 1 else slots
      val embPage = if (v2)
        dataPageV2Nested(codec, slots,
          if (lieRows && gi == 0) g.length + 1 else g.length,
          slots - present, repB, defB, vals.toByteArray)
      else dataPageNested(codec, declaredSlots, repB, defB, vals.toByteArray)
      val statMax = if (lieStats && gi == lieGi && present > 0)
        fMax - 0.25f else fMax
      (g.length.toLong, Seq(
        Chunk(idPage._1, idPage._2, T_INT64, "doc_id", g.length.toLong,
          Some((idMin, idMax))),
        NChunk(embPage._1, embPage._2, declaredSlots.toLong,
          (slots - present).toLong,
          if (present > 0) Some((fMin, statMax)) else None)))
    }
    // ---- layout + footer (self-contained: the nested schema tree)
    val offs = rgMeta.map { case (_, cols) =>
      cols.map { c =>
        val o = out.size().toLong
        val bytes = c match {
          case ch: Chunk => ch.bytes
          case nc: NChunk => nc.bytes
        }
        out.write(bytes, 0, bytes.length)
        o
      }
    }
    val w = new TWriter
    w.struct { f =>
      f.i32(1, 1)
      f.list(2, 12, 5) { // root + doc_id + emb/list/element
        w.structElem { s => s.str(4, "graft_schema"); s.i32(5, 2) }
        w.structElem { s =>
          s.i32(1, T_INT64.toLong); s.i32(3, 0); s.str(4, "doc_id")
        }
        w.structElem { s =>
          s.i32(3, 1); s.str(4, "emb"); s.i32(5, 1); s.i32(6, 3) // LIST
        }
        w.structElem { s => s.i32(3, 2); s.str(4, "list"); s.i32(5, 1) }
        w.structElem { s =>
          s.i32(1, T_FLOAT.toLong); s.i32(3, 1); s.str(4, "element")
        }
      }
      f.i64(3, rows.length.toLong)
      f.list(4, 12, rgMeta.length) {
        rgMeta.zip(offs).foreach { case ((nRows, cols), os) =>
          w.structElem { rg =>
            rg.list(1, 12, 2) {
              // doc_id
              w.structElem { cc =>
                cc.i64(2, os(0))
                cc.structField(3) { md =>
                  md.i32(1, T_INT64.toLong)
                  md.list(2, 5, 2) {
                    w.i32Elem(ENC_PLAIN.toLong); w.i32Elem(ENC_RLE.toLong)
                  }
                  md.list(3, 8, 1) { w.binElem("doc_id".getBytes("UTF-8")) }
                  md.i32(4, codec.toLong)
                  val ch = cols(0).asInstanceOf[Chunk]
                  md.i64(5, ch.numValues)
                  md.i64(6, ch.uncompressed)
                  md.i64(7, ch.bytes.length.toLong)
                  md.i64(9, os(0))
                  md.structField(12) { st =>
                    st.i64(3, 0L)
                    ch.stats.foreach { case (mn, mx) =>
                      st.bin(5, le64bytes(mx)); st.bin(6, le64bytes(mn))
                    }
                  }
                }
              }
              // emb.list.element
              w.structElem { cc =>
                cc.i64(2, os(1))
                cc.structField(3) { md =>
                  md.i32(1, T_FLOAT.toLong)
                  md.list(2, 5, 2) {
                    w.i32Elem(ENC_PLAIN.toLong); w.i32Elem(ENC_RLE.toLong)
                  }
                  md.list(3, 8, 3) {
                    w.binElem("emb".getBytes("UTF-8"))
                    w.binElem("list".getBytes("UTF-8"))
                    w.binElem("element".getBytes("UTF-8"))
                  }
                  md.i32(4, codec.toLong)
                  val nc = cols(1).asInstanceOf[NChunk]
                  md.i64(5, nc.numValues)
                  md.i64(6, nc.uncompressed)
                  md.i64(7, nc.bytes.length.toLong)
                  md.i64(9, os(1))
                  md.structField(12) { st =>
                    st.i64(3, nc.nulls)
                    nc.stats.foreach { case (mn, mx) =>
                      st.bin(5, le32f(mx)); st.bin(6, le32f(mn))
                    }
                  }
                }
              }
            }
            rg.i64(2, cols.map {
              case ch: Chunk => ch.uncompressed
              case nc: NChunk => nc.uncompressed
            }.sum)
            rg.i64(3, nRows)
          }
        }
      }
      f.str(6, "graft-d171")
    }
    val footer = w.bytes
    out.write(footer, 0, footer.length)
    le32(out, footer.length)
    out.write(MAGIC, 0, 4)
    out.toByteArray
  }

  private final case class NChunk(bytes: Array[Byte], uncompressed: Long,
                                  numValues: Long, nulls: Long,
                                  stats: Option[(Float, Float)])

  /** v1 page for a REQUIRED flat column: no level sections at all. */
  private def dataPageReq(codec: Int, n: Int,
                          values: Array[Byte]): (Array[Byte], Long) = {
    val comp = compress(codec, values)
    val w = new TWriter
    w.struct { s =>
      s.i32(1, 0)
      s.i32(2, values.length.toLong)
      s.i32(3, comp.length.toLong)
      s.i32(4, pageCrc(comp).toLong)
      s.structField(5) { d =>
        d.i32(1, n.toLong)
        d.i32(2, ENC_PLAIN.toLong)
        d.i32(3, 4L) // BIT_PACKED, vacuous (no def section)
        d.i32(4, 4L)
      }
    }
    val hdr = w.bytes
    val out = new java.io.ByteArrayOutputStream(comp.length + hdr.length)
    out.write(hdr, 0, hdr.length)
    out.write(comp, 0, comp.length)
    (out.toByteArray, (values.length + hdr.length).toLong)
  }

  /** v2 page for a REQUIRED flat column. */
  private def dataPageV2Req(codec: Int, n: Int,
                            values: Array[Byte]): (Array[Byte], Long) = {
    val comp = compress(codec, values)
    val w = new TWriter
    w.struct { s =>
      s.i32(1, 3)
      s.i32(2, values.length.toLong)
      s.i32(3, comp.length.toLong)
      s.i32(4, pageCrc(comp).toLong)
      s.structField(8) { d =>
        d.i32(1, n.toLong); d.i32(2, 0L); d.i32(3, n.toLong)
        d.i32(4, ENC_PLAIN.toLong); d.i32(5, 0L); d.i32(6, 0L)
        d.bool(7, codec != 0)
      }
    }
    val hdr = w.bytes
    val out = new java.io.ByteArrayOutputStream(comp.length + hdr.length)
    out.write(hdr, 0, hdr.length)
    out.write(comp, 0, comp.length)
    (out.toByteArray, (hdr.length + values.length).toLong)
  }

  /** v1 nested page: [len][rep RLE][len][def RLE][PLAIN values],
    * compressed WHOLE (the v1 contract). */
  private def dataPageNested(codec: Int, declaredSlots: Int,
                             repB: Array[Byte], defB: Array[Byte],
                             values: Array[Byte]): (Array[Byte], Long) = {
    val body = new java.io.ByteArrayOutputStream(
      repB.length + defB.length + values.length + 8)
    le32(body, repB.length)
    body.write(repB, 0, repB.length)
    le32(body, defB.length)
    body.write(defB, 0, defB.length)
    body.write(values, 0, values.length)
    val raw = body.toByteArray
    val comp = compress(codec, raw)
    val w = new TWriter
    w.struct { s =>
      s.i32(1, 0)
      s.i32(2, raw.length.toLong)
      s.i32(3, comp.length.toLong)
      s.i32(4, pageCrc(comp).toLong)
      s.structField(5) { d =>
        d.i32(1, declaredSlots.toLong)
        d.i32(2, ENC_PLAIN.toLong)
        d.i32(3, ENC_RLE.toLong)
        d.i32(4, ENC_RLE.toLong)
      }
    }
    val hdr = w.bytes
    val out = new java.io.ByteArrayOutputStream(comp.length + hdr.length)
    out.write(hdr, 0, hdr.length)
    out.write(comp, 0, comp.length)
    (out.toByteArray, (raw.length + hdr.length).toLong)
  }

  /** v2 nested page: rep + def level bytes OUTSIDE the compressed
    * region, their lengths in the header, PLAIN float data inside. */
  private def dataPageV2Nested(codec: Int, slots: Int, declRows: Int,
                               nulls: Int, repB: Array[Byte],
                               defB: Array[Byte],
                               values: Array[Byte]): (Array[Byte], Long) = {
    val comp = compress(codec, values)
    val w = new TWriter
    w.struct { s =>
      s.i32(1, 3)
      s.i32(2, (repB.length + defB.length + values.length).toLong)
      s.i32(3, (repB.length + defB.length + comp.length).toLong)
      s.i32(4, pageCrc(repB ++ defB ++ comp).toLong)
      s.structField(8) { d =>
        d.i32(1, slots.toLong)
        d.i32(2, nulls.toLong)
        d.i32(3, declRows.toLong)
        d.i32(4, ENC_PLAIN.toLong)
        d.i32(5, defB.length.toLong)
        d.i32(6, repB.length.toLong)
        d.bool(7, codec != 0)
      }
    }
    val hdr = w.bytes
    val out = new java.io.ByteArrayOutputStream(comp.length + hdr.length)
    out.write(hdr, 0, hdr.length)
    out.write(repB, 0, repB.length)
    out.write(defB, 0, defB.length)
    out.write(comp, 0, comp.length)
    (out.toByteArray,
      (hdr.length + repB.length + defB.length + values.length).toLong)
  }

  private final case class Chunk(bytes: Array[Byte], uncompressed: Long,
                                 tpe: Int, name: String, numValues: Long,
                                 stats: Option[(Long, Long)],
                                 bloom: Option[Array[Byte]] = None)

  /** Write a parquet file over (doc_id, val, text) rows, `rowGroupCut`
    * rows per group, pages compressed through `codec` (0/1/2/4 =
    * none/snappy/gzip/zstd — OUR codecs). `lieStats` fakes the first
    * row group's `val` max_value one too low (the %7==3 damage — the
    * d123 lying-table class aimed at scan pruning); `lieNumValues`
    * inflates the first doc_id page's declared num_values (the %7==5
    * damage — the page no longer tiles). */
  private[graft] def write(rows: Seq[(Long, Long, String)], rowGroupCut: Int,
                           codec: Int, lieStats: Boolean = false,
                           lieNumValues: Boolean = false,
                           blooms: Boolean = false,
                           lieBloom: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    out.write(MAGIC, 0, 4)
    val groups = rows.grouped(rowGroupCut).toSeq
    val rgMeta = groups.zipWithIndex.map { case (g, gi) =>
      val cols = Seq(("doc_id", T_INT64), ("val", T_INT64),
        ("text", T_BYTE_ARRAY)).map { case (name, tpe) =>
        val values = new java.io.ByteArrayOutputStream()
        var sMin = Long.MaxValue
        var sMax = Long.MinValue
        g.foreach { case (id, v, t) =>
          if (tpe == T_INT64) {
            val x = if (name == "doc_id") id else v
            le64(values, x)
            if (x < sMin) sMin = x
            if (x > sMax) sMax = x
          } else {
            val tb = t.getBytes("UTF-8")
            le32(values, tb.length)
            values.write(tb, 0, tb.length)
          }
        }
        val declared = if (lieNumValues && gi == 0 && name == "doc_id")
          g.length + 1 else g.length
        val (page, uncomp) = dataPage(codec, g.length, declared,
          values.toByteArray)
        val declMax = if (lieStats && gi == 0 && name == "val") sMax - 1
          else sMax
        // d138: the split-block bloom filter over the chunk's values
        // (INT64 scope — where scan pruning bites); the %7==5 lie
        // clears one bit the FIRST value needs, turning the filter
        // into one that wrongly prunes an existing row
        val bloom =
          if (blooms && tpe == T_INT64 && g.nonEmpty) {
            val vs = g.map { case (id, v, _) => if (name == "doc_id") id else v }
            val nBlocks = 8
            val words = new Array[Int](nBlocks * 8)
            vs.foreach(v => ParquetCodec.Sbbf.insert(
              words, nBlocks, ParquetCodec.Sbbf.hashInt64(v)))
            if (lieBloom && gi == 0 && name == "doc_id") {
              val h = ParquetCodec.Sbbf.hashInt64(vs.head)
              val base = ParquetCodec.Sbbf.blockIdx(h, nBlocks) * 8
              val bit = (h.toInt * ParquetCodec.Sbbf.SALT(0)) >>> 27
              words(base) &= ~(1 << bit)
            }
            val w = new TWriter
            w.struct { s =>
              s.i32(1, (nBlocks * 32).toLong) // numBytes
              s.structField(2)(a => a.structField(1)(_ => ())) // BLOCK
              s.structField(3)(a => a.structField(1)(_ => ())) // XXHASH
              s.structField(4)(a => a.structField(1)(_ => ())) // UNCOMPRESSED
            }
            val out2 = new java.io.ByteArrayOutputStream(w.bytes.length + nBlocks * 32)
            out2.write(w.bytes, 0, w.bytes.length)
            words.foreach(x => le32(out2, x))
            Some(out2.toByteArray)
          } else None
        Chunk(page, uncomp, tpe, name, g.length.toLong,
          if (tpe == T_INT64 && g.nonEmpty) Some((sMin, declMax)) else None,
          bloom)
      }
      val offs = cols.map { c =>
        val o = out.size().toLong
        out.write(c.bytes, 0, c.bytes.length)
        val bo = c.bloom.map { bb =>
          val b0 = out.size().toLong
          out.write(bb, 0, bb.length)
          (b0, bb.length)
        }
        (o, bo)
      }
      (g.length.toLong, cols.zip(offs))
    }
    writeFooter(out, rows.length.toLong, rgMeta, codec)
    out.toByteArray
  }

  /** The shared footer render (v1 and v2 files differ only in their
    * pages — the footer grammar is identical). */
  /** d175 — the PAGE-INDEX writer: the (doc_id, val, text) table in
    * v1 PLAIN pages, `pageRows` rows per page (multiple pages per
    * chunk — what makes a page index mean anything), with a
    * ColumnIndex + OffsetIndex per chunk after the data region and
    * the four ColumnChunk offset/length fields set. Bounds exact
    * (int64 LE, UTF8 bytes untruncated), null_pages all-false (the
    * sim writes no nulls), null_counts zeros, boundary_order
    * computed HONESTLY from the page bounds unless `lieOrder`.
    * `liePageMax` lowers the first row group's `val` ColumnIndex
    * max_values[0] by one — the PAGE-pruning lie (chunk stats stay
    * true; only the page-index audit can catch it); `lieFirstRow`
    * bumps the second page's first_row_index — the row-skip lie;
    * `lieOrder` claims the opposite monotonicity of the truth. */
  private[graft] def writePaged(rows: Seq[(Long, Long, String)],
                                rowGroupCut: Int, pageRows: Int, codec: Int,
                                liePageMax: Boolean = false,
                                lieFirstRow: Boolean = false,
                                lieOrder: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    out.write(MAGIC, 0, 4)
    val groups = rows.grouped(rowGroupCut).toSeq
    final case class PageMeta(off: Long, size: Long, nRows: Int,
                              minB: Array[Byte], maxB: Array[Byte])
    final case class ChunkMeta(name: String, tpe: Int, off: Long,
                               numValues: Long, uncompressed: Long,
                               totalBytes: Long, stats: Option[(Long, Long)],
                               pages: Seq[PageMeta])
    def lex(a: Array[Byte], b2: Array[Byte]): Int = {
      var i = 0
      while (i < a.length && i < b2.length) {
        val d = (a(i) & 0xFF) - (b2(i) & 0xFF)
        if (d != 0) return d
        i += 1
      }
      a.length - b2.length
    }
    val rgMetaP = groups.map { g =>
      val cols = Seq(("doc_id", T_INT64), ("val", T_INT64),
        ("text", T_BYTE_ARRAY)).map { case (name, tpe) =>
        val chunkOff = out.size().toLong
        var sMin = Long.MaxValue
        var sMax = Long.MinValue
        var uncomp = 0L
        val pages = g.grouped(pageRows).map { pg =>
          val values = new java.io.ByteArrayOutputStream(64)
          var pMinB: Array[Byte] = null
          var pMaxB: Array[Byte] = null
          pg.foreach { case (id, v, t) =>
            if (tpe == T_INT64) {
              val x = if (name == "doc_id") id else v
              if (x < sMin) sMin = x
              if (x > sMax) sMax = x
              values.write(le64bytes(x), 0, 8)
            } else {
              val bs = t.getBytes("UTF-8")
              if (pMinB == null || lex(bs, pMinB) < 0) pMinB = bs
              if (pMaxB == null || lex(bs, pMaxB) > 0) pMaxB = bs
              le32(values, bs.length)
              values.write(bs, 0, bs.length)
            }
          }
          val (page, uncompPage) = dataPage(codec, pg.length, pg.length,
            values.toByteArray)
          uncomp += uncompPage
          val off = out.size().toLong
          out.write(page, 0, page.length)
          val (mnB, mxB) = if (tpe == T_INT64) {
            val xs = pg.map { case (id, v, _) =>
              if (name == "doc_id") id else v
            }
            (le64bytes(xs.min), le64bytes(xs.max))
          } else (pMinB, pMaxB)
          PageMeta(off, page.length.toLong, pg.length, mnB, mxB)
        }.toSeq
        ChunkMeta(name, tpe, chunkOff, g.length.toLong, uncomp,
          out.size().toLong - chunkOff,
          if (tpe == T_INT64) Some((sMin, sMax)) else None, pages)
      }
      (g.length.toLong, cols)
    }
    // ---- column indexes then offset indexes (parquet-mr layout)
    def cmpVals(tpe: Int, a: Array[Byte], b2: Array[Byte]): Int =
      if (tpe == T_INT64) java.lang.Long.compare(le64of(a), le64of(b2))
      else lex(a, b2)
    val ciMeta = rgMetaP.zipWithIndex.map { case ((_, cols), gi) =>
      cols.map { c =>
        val off = out.size().toLong
        val w = new TWriter
        val asc = c.pages.sliding(2).forall {
          case Seq(a, b2) => cmpVals(c.tpe, a.minB, b2.minB) <= 0 &&
            cmpVals(c.tpe, a.maxB, b2.maxB) <= 0
          case _ => true
        }
        val desc = c.pages.sliding(2).forall {
          case Seq(a, b2) => cmpVals(c.tpe, a.minB, b2.minB) >= 0 &&
            cmpVals(c.tpe, a.maxB, b2.maxB) >= 0
          case _ => true
        }
        val honest = if (asc) 1L else if (desc) 2L else 0L
        val declared =
          if (lieOrder && gi == 0 && c.name == "val")
            (if (asc) 2L else 1L)
          else honest
        w.struct { ci =>
          ci.list(1, 1, c.pages.length) {
            c.pages.foreach(_ => w.boolElem(false))
          }
          ci.list(2, 8, c.pages.length) {
            c.pages.foreach(p => w.binElem(p.minB))
          }
          ci.list(3, 8, c.pages.length) {
            c.pages.zipWithIndex.foreach { case (p, pi) =>
              val mx = if (liePageMax && gi == 0 && c.name == "val" &&
                pi == 0) le64bytes(le64of(p.maxB) - 1)
              else p.maxB
              w.binElem(mx)
            }
          }
          ci.i32(4, declared)
          ci.list(5, 6, c.pages.length) {
            c.pages.foreach(_ => w.i64Elem(0L))
          }
        }
        val bytes = w.bytes
        out.write(bytes, 0, bytes.length)
        (off, bytes.length)
      }
    }
    val oiMeta = rgMetaP.zipWithIndex.map { case ((_, cols), gi) =>
      cols.map { c =>
        val off = out.size().toLong
        val w = new TWriter
        w.struct { oi =>
          oi.list(1, 12, c.pages.length) {
            var firstRow = 0L
            c.pages.zipWithIndex.foreach { case (p, pi) =>
              val fr = if (lieFirstRow && gi == 0 && c.name == "val" &&
                pi == 1) firstRow + 1
              else firstRow
              w.structElem { pl =>
                pl.i64(1, p.off)
                pl.i32(2, p.size)
                pl.i64(3, fr)
              }
              firstRow += p.nRows
            }
          }
        }
        val bytes = w.bytes
        out.write(bytes, 0, bytes.length)
        (off, bytes.length)
      }
    }
    // ---- footer with the index offset/length fields
    val w = new TWriter
    w.struct { f =>
      f.i32(1, 1)
      f.list(2, 12, 4) {
        w.structElem { s => s.str(4, "graft_schema"); s.i32(5, 3) }
        Seq(("doc_id", T_INT64), ("val", T_INT64), ("text", T_BYTE_ARRAY))
          .foreach { case (name, tpe) =>
            w.structElem { s =>
              s.i32(1, tpe.toLong)
              s.i32(3, 1)
              s.str(4, name)
              if (tpe == T_BYTE_ARRAY) s.i32(6, 0)
            }
          }
      }
      f.i64(3, rows.length.toLong)
      f.list(4, 12, rgMetaP.length) {
        rgMetaP.zipWithIndex.foreach { case ((nRows, cols), gi) =>
          w.structElem { rg =>
            rg.list(1, 12, cols.length) {
              cols.zipWithIndex.foreach { case (c, ciI) =>
                w.structElem { cc =>
                  cc.i64(2, c.off)
                  cc.structField(3) { md =>
                    md.i32(1, c.tpe.toLong)
                    md.list(2, 5, 2) {
                      w.i32Elem(ENC_PLAIN.toLong)
                      w.i32Elem(ENC_RLE.toLong)
                    }
                    md.list(3, 8, 1) { w.binElem(c.name.getBytes("UTF-8")) }
                    md.i32(4, codec.toLong)
                    md.i64(5, c.numValues)
                    md.i64(6, c.uncompressed)
                    md.i64(7, c.totalBytes)
                    md.i64(9, c.off)
                    md.structField(12) { st =>
                      st.i64(3, 0L)
                      c.stats.foreach { case (mn, mx) =>
                        st.bin(5, le64bytes(mx)); st.bin(6, le64bytes(mn))
                      }
                    }
                  }
                  cc.i64(4, oiMeta(gi)(ciI)._1)
                  cc.i32(5, oiMeta(gi)(ciI)._2.toLong)
                  cc.i64(6, ciMeta(gi)(ciI)._1)
                  cc.i32(7, ciMeta(gi)(ciI)._2.toLong)
                }
              }
            }
            rg.i64(2, cols.map(_.uncompressed).sum)
            rg.i64(3, nRows)
          }
        }
      }
      f.str(6, "graft-d175")
    }
    val footer = w.bytes
    out.write(footer, 0, footer.length)
    le32(out, footer.length)
    out.write(MAGIC, 0, 4)
    out.toByteArray
  }

  private def writeFooter(out: java.io.ByteArrayOutputStream, nRowsTotal: Long,
      rgMeta: Seq[(Long, Seq[(Chunk, (Long, Option[(Long, Int)]))])],
      codec: Int): Unit = {
    val w = new TWriter
    w.struct { f =>
      f.i32(1, 1) // version
      f.list(2, 12, 4) { // schema: root + 3 children
        w.structElem { s =>
          s.str(4, "graft_schema")
          s.i32(5, 3)
        }
        Seq(("doc_id", T_INT64), ("val", T_INT64), ("text", T_BYTE_ARRAY))
          .foreach { case (name, tpe) =>
            w.structElem { s =>
              s.i32(1, tpe.toLong)
              s.i32(3, 1) // OPTIONAL
              s.str(4, name)
              if (tpe == T_BYTE_ARRAY) s.i32(6, 0) // ConvertedType UTF8
            }
          }
      }
      f.i64(3, nRowsTotal)
      f.list(4, 12, rgMeta.length) {
        rgMeta.foreach { case (nRows, cols) =>
          w.structElem { rg =>
            rg.list(1, 12, cols.length) {
              cols.foreach { case (c, (off, bloomOff)) =>
                w.structElem { cc =>
                  cc.i64(2, off)
                  cc.structField(3) { md =>
                    md.i32(1, c.tpe.toLong)
                    md.list(2, 5, 2) {
                      w.i32Elem(ENC_PLAIN.toLong)
                      w.i32Elem(ENC_RLE.toLong)
                    }
                    md.list(3, 8, 1) { w.binElem(c.name.getBytes("UTF-8")) }
                    md.i32(4, codec.toLong)
                    md.i64(5, c.numValues)
                    md.i64(6, c.uncompressed)
                    md.i64(7, c.bytes.length.toLong)
                    md.i64(9, off)
                    md.structField(12) { st =>
                      st.i64(3, 0L) // null_count
                      c.stats.foreach { case (mn, mx) =>
                        st.bin(5, le64bytes(mx)) // max_value
                        st.bin(6, le64bytes(mn)) // min_value
                      }
                    }
                    bloomOff.foreach { case (bo, blen) =>
                      md.i64(14, bo) // bloom_filter_offset
                      md.i32(15, blen.toLong) // bloom_filter_length
                    }
                  }
                }
              }
            }
            rg.i64(2, cols.map(_._1.uncompressed).sum)
            rg.i64(3, nRows)
          }
        }
      }
      f.str(6, "graft-d126")
    }
    val footer = w.bytes
    out.write(footer, 0, footer.length)
    le32(out, footer.length)
    out.write(MAGIC, 0, 4)
  }

  // ---------------------------------------------------------------- reader

  private def fld(s: TStruct, id: Int): Option[TVal] = s.f.get(id)
  private def fi(s: TStruct, id: Int): Long = s.f.get(id) match {
    case Some(TI(v)) => v
    case _ => throw Malformed
  }
  private def fiOpt(s: TStruct, id: Int): Option[Long] = s.f.get(id) match {
    case Some(TI(v)) => Some(v)
    case None => None
    case _ => throw Malformed
  }
  private def flist(s: TStruct, id: Int): Seq[TVal] = s.f.get(id) match {
    case Some(TList(v)) => v
    case _ => throw Malformed
  }
  private def fbin(s: TStruct, id: Int): Array[Byte] = s.f.get(id) match {
    case Some(TBin(v)) => v
    case _ => throw Malformed
  }

  private def le64of(b: Array[Byte]): Long = {
    if (b.length != 8) throw Malformed
    var v = 0L
    var i = 0
    while (i < 8) { v |= (b(i) & 0xFFL) << (8 * i); i += 1 }
    v
  }

  /** Per-leaf-column walk result. Flat columns use the first eight
    * fields (the pre-r16 shape — every call site constructs them
    * positionally, so the nested counters default). For LIST leaves
    * (d171): `rows` = repetition-level-0 slots (the row count the rep
    * levels encode), `nullLists`/`emptyLists` from the definition
    * ladder, `nulls` = every slot below max_def (parquet-mr's
    * null_count convention), `sumF`/`minF`/`maxF` aggregate FLOAT
    * values (exact for the sim's quarter-floats). */
  private[graft] final case class ColResult(
      path: String, tpe: Int, numValues: Long, nulls: Long,
      sumInt: Long, minInt: Long, maxInt: Long, byteLen: Long,
      rows: Long = 0L, nullLists: Long = 0L, emptyLists: Long = 0L,
      sumF: Double = 0.0, minF: Double = Double.PositiveInfinity,
      maxF: Double = Double.NegativeInfinity)
  private[graft] final case class PqInfo(
      numRows: Long, nRowGroups: Int, nPages: Int, cols: Seq[ColResult])

  /** VALUE extraction for the (doc_id, val, text) shape [[write]]
    * emits (d173: the Delta checkpoint is a parquet file whose ROWS
    * are the table state — the walker's aggregate surface is not
    * enough, the replayer needs the actions back). Strictness comes
    * in two layers: the full [[read]] audit runs FIRST (footer
    * grammar, page tiling, CRCs, stats); then this pass re-walks the
    * v1 PLAIN pages collecting values. Scope = our own writer's
    * output shape (v1 pages, PLAIN, the 3-col schema) — anything
    * else returns None, never a guess. */
  private[graft] def readRows(b: Array[Byte]): Option[Seq[(Long, Long, String)]] =
    try {
      if (read(b).isEmpty) return None
      val flen = ((b(b.length - 8) & 0xFF) | ((b(b.length - 7) & 0xFF) << 8) |
        ((b(b.length - 6) & 0xFF) << 16) | ((b(b.length - 5) & 0xFF) << 24))
      val fStart = b.length - 8 - flen
      val footer = new TReader(b, fStart, b.length - 8).struct()
      val rowGroups = flist(footer, 4).map {
        case s: TStruct => s
        case _ => throw Malformed
      }
      val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
      val vals = scala.collection.mutable.ArrayBuffer.empty[Long]
      val texts = scala.collection.mutable.ArrayBuffer.empty[String]
      rowGroups.foreach { rg =>
        flist(rg, 1).foreach {
          case cc: TStruct =>
            val md = fld(cc, 3) match {
              case Some(s: TStruct) => s
              case _ => throw Malformed
            }
            val tpe = fi(md, 1).toInt
            val codec = fi(md, 4).toInt
            val numValues = fi(md, 5)
            val path = flist(md, 3).map {
              case TBin(v) => new String(v, "UTF-8")
              case _ => throw Malformed
            }.mkString(".")
            var pos = fi(md, 9).toInt
            var seen = 0L
            while (seen < numValues) {
              val tr = new TReader(b, pos, fStart)
              val ph = tr.struct()
              if (fi(ph, 1).toInt != 0) throw Malformed // v1 PLAIN only
              val uSize = fi(ph, 2).toInt
              val cSize = fi(ph, 3).toInt
              val rawStart = tr.pos
              val page = decompress(codec, b, rawStart, rawStart + cSize, uSize)
              pos = tr.pos + cSize
              val dh = fld(ph, 5) match {
                case Some(s: TStruct) => s
                case _ => throw Malformed
              }
              val pn = fi(dh, 1).toInt
              if (fi(dh, 2).toInt != ENC_PLAIN) throw Malformed
              // our writer's columns are OPTIONAL with all-1 def levels
              val ll = (page(0) & 0xFF) | ((page(1) & 0xFF) << 8) |
                ((page(2) & 0xFF) << 16) | ((page(3) & 0xFF) << 24)
              val (levels, _) = rleHybrid(page, 4, 4 + ll, 1, pn)
              if (levels.exists(_ != 1)) throw Malformed
              var p = 4 + ll
              var k = 0
              while (k < pn) {
                if (tpe == T_INT64) {
                  val v = le64of(java.util.Arrays.copyOfRange(page, p, p + 8))
                  if (path == "doc_id") ids += v else vals += v
                  p += 8
                } else {
                  val l = (page(p) & 0xFF) | ((page(p + 1) & 0xFF) << 8) |
                    ((page(p + 2) & 0xFF) << 16) | ((page(p + 3) & 0xFF) << 24)
                  texts += new String(page, p + 4, l, "UTF-8")
                  p += 4 + l
                }
                k += 1
              }
              seen += pn
            }
          case _ => throw Malformed
        }
      }
      if (ids.length != vals.length || ids.length != texts.length)
        throw Malformed
      Some(ids.indices.map(i => (ids(i), vals(i), texts(i))))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      case _: MatchError => None
    }

  /** Walk the whole file: footer grammar, every page of every chunk,
    * values decoded and AUDITED against the declared statistics and
    * num_values. None on any structural violation, size/count
    * mismatch, undecodable page, or a LYING statistic. */
  private[graft] def read(b: Array[Byte]): Option[PqInfo] =
    try {
      if (b.length < 12) throw Malformed
      if (!java.util.Arrays.equals(java.util.Arrays.copyOfRange(b, 0, 4), MAGIC) ||
          !java.util.Arrays.equals(
            java.util.Arrays.copyOfRange(b, b.length - 4, b.length), MAGIC))
        throw Malformed
      val flen = ((b(b.length - 8) & 0xFF) | ((b(b.length - 7) & 0xFF) << 8) |
        ((b(b.length - 6) & 0xFF) << 16) | ((b(b.length - 5) & 0xFF) << 24))
      val fStart = b.length - 8 - flen
      if (flen <= 0 || fStart < 4) throw Malformed
      val footer = new TReader(b, fStart, b.length - 8).struct()
      val numRows = fi(footer, 3)
      // schema: root first, then flat children (bounded scope: depth 1)
      val schema = flist(footer, 2).map {
        case s: TStruct => s
        case _ => throw Malformed
      }
      if (schema.isEmpty) throw Malformed
      // leaf table: path -> (type, max_def, max_rep, outer_optional).
      // Scope (r16, d171): FLAT columns (max_rep 0, max_def <= 1) and
      // the standard 3-LEVEL LIST — optional/required group (LIST)
      // { repeated group <mid> { required/optional leaf } } — the
      // layout Spark writes for array<float>/array<long> columns.
      // Deeper nesting, MAP, and bare REPEATED leaves stay out of
      // scope and quarantine. The definition ladder for a list leaf:
      // def < oOpt -> null list; def == oOpt -> empty list;
      // def == max_def - 1 (optional element only) -> null element;
      // def == max_def -> a concrete value. REQUIRED flat columns
      // (max_def 0) have NO level sections in their v1 pages.
      val colTypes = {
        val m = scala.collection.mutable.LinkedHashMap
          .empty[String, (Int, Int, Int, Int)]
        def leafOk(t: Int): Unit =
          if (t != T_INT64 && t != T_BYTE_ARRAY && t != T_FLOAT)
            throw Malformed
        var i = 1 // schema(0) is the root
        while (i < schema.length) {
          val s = schema(i); i += 1
          val name = new String(fbin(s, 4), "UTF-8")
          val rep = fiOpt(s, 3).getOrElse(0L).toInt
          if (rep < 0 || rep > 1) throw Malformed // top level never REPEATED
          val nc = fiOpt(s, 5).getOrElse(0L).toInt
          if (nc == 0) {
            val tpe = fi(s, 1).toInt
            leafOk(tpe)
            m(name) = (tpe, rep, 0, rep)
          } else {
            // the LIST annotation is the contract, not decoration:
            // ConvertedType LIST (3) or the logicalType LIST union arm
            val isList = fiOpt(s, 6).contains(3L) || (fld(s, 10) match {
              case Some(lt: TStruct) => lt.f.contains(3)
              case _ => false
            })
            if (!isList || nc != 1 || i + 1 >= schema.length) throw Malformed
            val mid = schema(i); i += 1
            if (fiOpt(mid, 3).getOrElse(0L) != 2L ||
                fiOpt(mid, 5).getOrElse(0L) != 1L) throw Malformed
            val el = schema(i); i += 1
            if (fiOpt(el, 5).exists(_ > 0)) throw Malformed
            val erep = fiOpt(el, 3).getOrElse(0L).toInt
            if (erep < 0 || erep > 1) throw Malformed
            val tpe = fi(el, 1).toInt
            leafOk(tpe)
            val midName = new String(fbin(mid, 4), "UTF-8")
            val elName = new String(fbin(el, 4), "UTF-8")
            m(s"$name.$midName.$elName") = (tpe, rep + 1 + erep, 1, rep)
          }
        }
        m
      }
      val rowGroups = flist(footer, 4).map {
        case s: TStruct => s
        case _ => throw Malformed
      }
      var nPages = 0
      val acc = scala.collection.mutable.LinkedHashMap
        .empty[String, ColResult]
      var rowsSeen = 0L
      rowGroups.foreach { rg =>
        val rgRows = fi(rg, 3)
        rowsSeen += rgRows
        flist(rg, 1).foreach {
          case cc: TStruct =>
            val md = fld(cc, 3) match {
              case Some(s: TStruct) => s
              case _ => throw Malformed
            }
            val tpe = fi(md, 1).toInt
            val codec = fi(md, 4).toInt
            val numValues = fi(md, 5)
            val path = flist(md, 3).map {
              case TBin(v) => new String(v, "UTF-8")
              case _ => throw Malformed
            }.mkString(".")
            val (schemaTpe, maxDef, maxRep, oOpt) =
              colTypes.getOrElse(path, throw Malformed)
            if (schemaTpe != tpe) throw Malformed
            val optional = maxDef > 0
            val defWidth = 32 - Integer.numberOfLeadingZeros(math.max(maxDef, 1))
            val dataOff = fi(md, 9)
            val dictOff = fiOpt(md, 11)
            var pos = math.min(dataOff, dictOff.getOrElse(dataOff)).toInt
            if (pos < 4 || pos >= fStart) throw Malformed
            val bloomOff = fiOpt(md, 14)
            // d138: membership audit needs the values themselves;
            // INT64 scope (where pruning bites), bounded per chunk
            val collect: scala.collection.mutable.ArrayBuffer[Long] =
              if (bloomOff.isDefined && tpe == T_INT64)
                scala.collection.mutable.ArrayBuffer.empty[Long]
              else null
            var dict: Array[Long] = null // int64 dict
            var dictBin: Array[Array[Byte]] = null
            var dictF: Array[Float] = null // float dict (d171)
            var seen = 0L
            var nulls = 0L
            var sum = 0L
            var mn = Long.MaxValue
            var mx = Long.MinValue
            var blen = 0L
            // nested counters (d171): rep-0 slots = rows; the def
            // ladder splits the below-max_def slots
            var rows0 = 0L
            var nullL = 0L
            var emptyL = 0L
            var fsum = 0.0
            var fmn = Float.MaxValue
            var fmx = Float.MinValue
            // per-PAGE stats (d175): the page-index audit needs the
            // recomputed per-page bounds/null counts/row offsets that
            // ColumnIndex/OffsetIndex claim — a page-level lie is the
            // pruning lie a 100 TB scan skips real data over
            final case class PageRec(off: Long, size: Long, rows: Long,
              nulls: Long, present: Long, minI: Long, maxI: Long,
              minF: Float, maxF: Float, minB: Array[Byte],
              maxB: Array[Byte], exactB: Boolean)
            val pageRecs = scala.collection.mutable.ArrayBuffer.empty[PageRec]
            var pMnI = Long.MaxValue
            var pMxI = Long.MinValue
            var pMnF = Float.MaxValue
            var pMxF = Float.MinValue
            var pMinB: Array[Byte] = null
            var pMaxB: Array[Byte] = null
            var pExactB = true
            var pNulls = 0L
            var pgRows = 0L
            var pPresent = 0L
            def pageReset(): Unit = {
              pMnI = Long.MaxValue; pMxI = Long.MinValue
              pMnF = Float.MaxValue; pMxF = Float.MinValue
              pMinB = null; pMaxB = null; pExactB = true
              pNulls = 0L; pgRows = 0L; pPresent = 0L
            }
            def lexCmp(x: Array[Byte], y: Array[Byte]): Int = {
              var i = 0
              while (i < x.length && i < y.length) {
                val d = (x(i) & 0xFF) - (y(i) & 0xFF)
                if (d != 0) return d
                i += 1
              }
              x.length - y.length
            }
            def pageRecord(off: Long, size: Long): Unit =
              pageRecs += PageRec(off, size, pgRows, pNulls, pPresent,
                pMnI, pMxI, pMnF, pMxF, pMinB, pMaxB, pExactB)
            // classify one def level; returns true iff a value follows
            def classifyDef(d: Int): Boolean = {
              if (d < 0 || d > maxDef) throw Malformed
              if (d == maxDef) true
              else {
                nulls += 1
                pNulls += 1
                if (maxRep > 0) {
                  if (d < oOpt) nullL += 1
                  else if (d == oOpt) emptyL += 1
                  // d == maxDef - 1 above oOpt: a null ELEMENT —
                  // already in `nulls`; legal only when the element
                  // is optional (maxDef == oOpt + 2), else unreachable
                  // because maxDef == oOpt + 1 makes oOpt == maxDef-1
                }
                false
              }
            }
            def addFloat(v: Float): Unit = {
              fsum += v
              if (v < fmn) fmn = v
              if (v > fmx) fmx = v
              if (v < pMnF) pMnF = v
              if (v > pMxF) pMxF = v
              pPresent += 1
            }
            def addBin(src: Array[Byte], from: Int, len: Int): Unit = {
              val v = java.util.Arrays.copyOfRange(src, from, from + len)
              if (pMinB == null || lexCmp(v, pMinB) < 0) pMinB = v
              if (pMaxB == null || lexCmp(v, pMaxB) > 0) pMaxB = v
              pPresent += 1
            }
            def le32f(a: Array[Byte], p0: Int): Float =
              java.lang.Float.intBitsToFloat((a(p0) & 0xFF) |
                ((a(p0 + 1) & 0xFF) << 8) | ((a(p0 + 2) & 0xFF) << 16) |
                ((a(p0 + 3) & 0xFF) << 24))
            while (seen < numValues) {
              val pageStart = pos.toLong // header start (PageLocation.offset)
              val tr = new TReader(b, pos, fStart)
              val ph = tr.struct()
              val pType = fi(ph, 1).toInt
              val uSize = fi(ph, 2).toInt
              val cSize = fi(ph, 3).toInt
              if (uSize < 0 || cSize < 0) throw Malformed
              val rawStart = tr.pos
              if (rawStart + cSize > fStart) throw Malformed
              val pageSize = (rawStart - pageStart) + cSize // header + data
              if (pType == 0 || pType == 3) pageReset()
              // the page CRC (field 4, parquet-mr writes it by
              // default): spec says CRC32 over the page data as
              // written, excluding the header — VERIFIED when present
              fiOpt(ph, 4).foreach { declared =>
                val c = new java.util.zip.CRC32
                c.update(b, rawStart, cSize)
                if ((declared & 0xFFFFFFFFL) != c.getValue) throw Malformed
              }
              // v1 + dictionary pages are compressed WHOLE; v2 pages
              // keep their level sections raw (handled in their branch)
              lazy val page = decompress(codec, b, rawStart, rawStart + cSize, uSize)
              pos = tr.pos + cSize
              nPages += 1
              pType match {
                case 2 => // dictionary page
                  val dh = fld(ph, 7) match {
                    case Some(s: TStruct) => s
                    case _ => throw Malformed
                  }
                  val dn = fi(dh, 1).toInt
                  if (dn < 0) throw Malformed
                  if (tpe == T_INT64) {
                    if (page.length != 8 * dn) throw Malformed
                    dict = Array.tabulate(dn)(i =>
                      le64of(java.util.Arrays.copyOfRange(page, 8 * i, 8 * i + 8)))
                  } else if (tpe == T_FLOAT) {
                    if (page.length != 4 * dn) throw Malformed
                    dictF = Array.tabulate(dn)(i => le32f(page, 4 * i))
                  } else {
                    val db = Array.newBuilder[Array[Byte]]
                    var p = 0
                    var k = 0
                    while (k < dn) {
                      if (p + 4 > page.length) throw Malformed
                      val l = (page(p) & 0xFF) | ((page(p + 1) & 0xFF) << 8) |
                        ((page(p + 2) & 0xFF) << 16) | ((page(p + 3) & 0xFF) << 24)
                      if (l < 0 || p + 4 + l > page.length) throw Malformed
                      db += java.util.Arrays.copyOfRange(page, p + 4, p + 4 + l)
                      p += 4 + l
                      k += 1
                    }
                    if (p != page.length) throw Malformed
                    dictBin = db.result()
                  }
                case 0 => // data page v1
                  val dh = fld(ph, 5) match {
                    case Some(s: TStruct) => s
                    case _ => throw Malformed
                  }
                  val pn = fi(dh, 1).toInt
                  val enc = fi(dh, 2).toInt
                  // the header's LEVEL encodings are part of the page
                  // contract, not decoration (the flip sweep caught
                  // exactly these fields sliding): when def levels are
                  // PRESENT (optional column) they must be RLE —
                  // anything else needs a decode we don't implement,
                  // so it's enforced, never guessed. Where a level
                  // section is ABSENT (required column / flat rep)
                  // parquet-mr declares BIT_PACKED (4) vacuously —
                  // accepted alongside RLE for exactly those fields.
                  val defEnc = fi(dh, 3)
                  val repEnc = fi(dh, 4)
                  if (optional) {
                    if (defEnc != ENC_RLE) throw Malformed
                  } else if (defEnc != ENC_RLE && defEnc != 4)
                    throw Malformed
                  if (maxRep > 0) {
                    if (repEnc != ENC_RLE) throw Malformed
                  } else if (repEnc != ENC_RLE && repEnc != 4)
                    throw Malformed
                  if (pn <= 0 || seen + pn > numValues) throw Malformed
                  // level sections, rep THEN def, each a 4-byte length
                  // prefix + RLE-hybrid. REQUIRED flat columns
                  // (max_def 0) omit both sections entirely; LIST
                  // leaves (d171) carry both — bit width 1 for rep
                  // (max_rep 1 in scope), ceil(log2(max_def+1)) for def
                  var nn = pn
                  var p = 0
                  def levelSection(width: Int): Array[Int] = {
                    if (p + 4 > page.length) throw Malformed
                    val ll = (page(p) & 0xFF) | ((page(p + 1) & 0xFF) << 8) |
                      ((page(p + 2) & 0xFF) << 16) | ((page(p + 3) & 0xFF) << 24)
                    if (ll < 0 || p + 4 + ll > page.length) throw Malformed
                    val (levels, lEnd) = rleHybrid(page, p + 4, p + 4 + ll, width, pn)
                    if (lEnd != p + 4 + ll) throw Malformed
                    p += 4 + ll
                    levels
                  }
                  if (maxRep > 0)
                    levelSection(1).foreach { r =>
                      if (r < 0 || r > maxRep) throw Malformed
                      if (r == 0) { rows0 += 1; pgRows += 1 }
                    }
                  if (optional) {
                    var pres = 0
                    levelSection(defWidth).foreach(d =>
                      if (classifyDef(d)) pres += 1)
                    nn = pres
                  }
                  enc match {
                    case ENC_PLAIN =>
                      if (tpe == T_INT64) {
                        if (page.length - p != 8 * nn) throw Malformed
                        var k = 0
                        while (k < nn) {
                          val v = le64of(java.util.Arrays.copyOfRange(
                            page, p, p + 8))
                          sum += v
                          if (collect != null) collect += v
                          if (v < mn) mn = v
                          if (v > mx) mx = v
                          if (v < pMnI) pMnI = v
                          if (v > pMxI) pMxI = v
                          pPresent += 1
                          p += 8
                          k += 1
                        }
                      } else if (tpe == T_FLOAT) {
                        if (page.length - p != 4 * nn) throw Malformed
                        var k = 0
                        while (k < nn) {
                          addFloat(le32f(page, p))
                          p += 4
                          k += 1
                        }
                      } else {
                        var k = 0
                        while (k < nn) {
                          if (p + 4 > page.length) throw Malformed
                          val l = (page(p) & 0xFF) | ((page(p + 1) & 0xFF) << 8) |
                            ((page(p + 2) & 0xFF) << 16) | ((page(p + 3) & 0xFF) << 24)
                          if (l < 0 || p + 4 + l > page.length) throw Malformed
                          blen += l
                          addBin(page, p + 4, l)
                          p += 4 + l
                          k += 1
                        }
                        if (p != page.length) throw Malformed
                      }
                    case ENC_PLAIN_DICT | ENC_RLE_DICT =>
                      if (p >= page.length) throw Malformed
                      val bw = page(p) & 0xFF
                      if (bw > 32) throw Malformed
                      val (idx, _) =
                        rleHybrid(page, p + 1, page.length, bw, nn)
                      idx.foreach { i =>
                        if (tpe == T_INT64) {
                          if (dict == null || i >= dict.length) throw Malformed
                          val v = dict(i)
                          sum += v
                          if (collect != null) collect += v
                          if (v < mn) mn = v
                          if (v > mx) mx = v
                          if (v < pMnI) pMnI = v
                          if (v > pMxI) pMxI = v
                          pPresent += 1
                        } else if (tpe == T_FLOAT) {
                          if (dictF == null || i >= dictF.length)
                            throw Malformed
                          addFloat(dictF(i))
                        } else {
                          if (dictBin == null || i >= dictBin.length)
                            throw Malformed
                          blen += dictBin(i).length
                          addBin(dictBin(i), 0, dictBin(i).length)
                        }
                      }
                    case _ => throw Malformed
                  }
                  if (maxRep == 0) pgRows = pn.toLong
                  pageRecord(pageStart, pageSize)
                  seen += pn
                case 3 => // data page V2 (d135): levels OUTSIDE the
                  // compressed region, no length prefix, DELTA encodings
                  val dh = fld(ph, 8) match {
                    case Some(s: TStruct) => s
                    case _ => throw Malformed
                  }
                  val pn = fi(dh, 1).toInt
                  val declNulls = fi(dh, 2)
                  val pRows = fi(dh, 3)
                  val enc = fi(dh, 4).toInt
                  val defLen = fi(dh, 5).toInt
                  val repLen = fi(dh, 6).toInt
                  val isComp = fld(dh, 7) match {
                    case Some(TBool(v)) => v
                    case None => true
                    case _ => throw Malformed
                  }
                  if (pn <= 0 || seen + pn > numValues) throw Malformed
                  if (defLen < 0 || repLen < 0 || defLen + repLen > cSize ||
                      defLen + repLen > uSize) throw Malformed
                  // v2 level sections sit OUTSIDE the compressed
                  // region, rep THEN def, no length prefixes (their
                  // lengths live in the header). Nested leaves (d171)
                  // must declare rep bytes; flat ones must not.
                  var nn = pn
                  if (maxRep > 0) {
                    if (repLen == 0) throw Malformed
                    val (reps, rEnd) =
                      rleHybrid(b, rawStart, rawStart + repLen, 1, pn)
                    if (rEnd != rawStart + repLen) throw Malformed
                    var r0 = 0L
                    reps.foreach { r =>
                      if (r < 0 || r > maxRep) throw Malformed
                      if (r == 0) r0 += 1
                    }
                    rows0 += r0
                    pgRows += r0
                    // the v2 ROW audit: num_rows must agree with the
                    // repetition levels themselves (the structural lie
                    // class — a wrong row count re-chunks every list)
                    if (pRows != r0) throw Malformed
                  } else {
                    if (repLen != 0) throw Malformed
                    if (pRows != pn) throw Malformed // unnested: rows == values
                  }
                  if (optional) {
                    val (levels, lEnd) = rleHybrid(b, rawStart + repLen,
                      rawStart + repLen + defLen, defWidth, pn)
                    if (lEnd != rawStart + repLen + defLen) throw Malformed
                    var nz = 0
                    levels.foreach(l => if (classifyDef(l)) nz += 1)
                    nn = nz
                    // the v2-specific AUDIT: the header's num_nulls must
                    // agree with the definition levels themselves
                    if (declNulls != (pn - nz).toLong) throw Malformed
                  } else if (defLen != 0 || declNulls != 0L) throw Malformed
                  val dataRaw = uSize - repLen - defLen
                  val data =
                    if (isComp)
                      decompress(codec, b, rawStart + repLen + defLen,
                        rawStart + cSize, dataRaw)
                    else {
                      if (cSize - repLen - defLen != dataRaw) throw Malformed
                      if (rawStart + cSize > fStart) throw Malformed
                      java.util.Arrays.copyOfRange(
                        b, rawStart + repLen + defLen, rawStart + cSize)
                    }
                  enc match {
                    case ENC_DELTA_BINARY_PACKED =>
                      if (tpe != T_INT64) throw Malformed
                      val (vs, endP) =
                        ParquetCodec.dbpDecode(data, 0, data.length, nn)
                      if (endP != data.length) throw Malformed
                      vs.foreach { v =>
                        sum += v
                        if (collect != null) collect += v
                        if (v < mn) mn = v
                        if (v > mx) mx = v
                        if (v < pMnI) pMnI = v
                        if (v > pMxI) pMxI = v
                        pPresent += 1
                      }
                    case ENC_DELTA_LENGTH_BYTE_ARRAY =>
                      if (tpe != T_BYTE_ARRAY) throw Malformed
                      val (lens, p1) =
                        ParquetCodec.dbpDecode(data, 0, data.length, nn)
                      if (lens.exists(_ < 0)) throw Malformed
                      if (p1 + lens.sum != data.length) throw Malformed
                      blen += lens.sum
                      pExactB = false
                      pPresent += nn
                    case ENC_DELTA_BYTE_ARRAY =>
                      if (tpe != T_BYTE_ARRAY) throw Malformed
                      val (pfx, p1) =
                        ParquetCodec.dbpDecode(data, 0, data.length, nn)
                      val (sfl, p2) =
                        ParquetCodec.dbpDecode(data, p1, data.length, nn)
                      if (pfx.exists(_ < 0) || sfl.exists(_ < 0)) throw Malformed
                      if (nn > 0 && pfx(0) != 0) throw Malformed
                      var prevLen = 0L
                      var k = 0
                      while (k < nn) {
                        if (pfx(k) > prevLen) throw Malformed // prefix overruns
                        prevLen = pfx(k) + sfl(k)
                        blen += prevLen
                        k += 1
                      }
                      if (p2 + sfl.sum != data.length) throw Malformed
                      pExactB = false // values not materialized here
                      pPresent += nn
                    case ENC_PLAIN =>
                      if (tpe == T_INT64) {
                        if (data.length != 8 * nn) throw Malformed
                        var k = 0
                        while (k < nn) {
                          val v = le64of(java.util.Arrays.copyOfRange(
                            data, 8 * k, 8 * k + 8))
                          sum += v
                          if (collect != null) collect += v
                          if (v < mn) mn = v
                          if (v > mx) mx = v
                          if (v < pMnI) pMnI = v
                          if (v > pMxI) pMxI = v
                          pPresent += 1
                          k += 1
                        }
                      } else if (tpe == T_FLOAT) {
                        if (data.length != 4 * nn) throw Malformed
                        var k = 0
                        while (k < nn) {
                          addFloat(le32f(data, 4 * k))
                          k += 1
                        }
                      } else {
                        var p = 0
                        var k = 0
                        while (k < nn) {
                          if (p + 4 > data.length) throw Malformed
                          val l = (data(p) & 0xFF) | ((data(p + 1) & 0xFF) << 8) |
                            ((data(p + 2) & 0xFF) << 16) | ((data(p + 3) & 0xFF) << 24)
                          if (l < 0 || p + 4 + l > data.length) throw Malformed
                          blen += l
                          addBin(data, p + 4, l)
                          p += 4 + l
                          k += 1
                        }
                        if (p != data.length) throw Malformed
                      }
                    case ENC_PLAIN_DICT | ENC_RLE_DICT =>
                      if (data.length < 1) throw Malformed
                      val bw = data(0) & 0xFF
                      if (bw > 32) throw Malformed
                      val (idx, _) = rleHybrid(data, 1, data.length, bw, nn)
                      idx.foreach { i =>
                        if (tpe == T_INT64) {
                          if (dict == null || i >= dict.length) throw Malformed
                          val v = dict(i)
                          sum += v
                          if (collect != null) collect += v
                          if (v < mn) mn = v
                          if (v > mx) mx = v
                          if (v < pMnI) pMnI = v
                          if (v > pMxI) pMxI = v
                          pPresent += 1
                        } else if (tpe == T_FLOAT) {
                          if (dictF == null || i >= dictF.length)
                            throw Malformed
                          addFloat(dictF(i))
                        } else {
                          if (dictBin == null || i >= dictBin.length)
                            throw Malformed
                          blen += dictBin(i).length
                          addBin(dictBin(i), 0, dictBin(i).length)
                        }
                      }
                    case _ => throw Malformed
                  }
                  if (maxRep == 0) pgRows = pn.toLong
                  pageRecord(pageStart, pageSize)
                  seen += pn
                case _ => throw Malformed // unknown page types quarantine
              }
            }
            if (seen != numValues) throw Malformed
            // the BLOOM audit (d138): parse the filter at its declared
            // offset and require EVERY decoded value present — a false
            // negative is a filter that wrongly prunes an existing row
            bloomOff.foreach { bo =>
              if (bo < 4 || bo >= fStart) throw Malformed
              val tr2 = new TReader(b, bo.toInt, fStart)
              val hdr = tr2.struct()
              val numBytes = fi(hdr, 1)
              if (numBytes <= 0 || numBytes % 32 != 0 ||
                  numBytes > (1L << 26)) throw Malformed
              def u1(id: Int): Boolean = fld(hdr, id) match {
                case Some(s: TStruct) => s.f.contains(1)
                case _ => false
              }
              // unknown algorithm/hash/compression unions: the spec
              // says ignore the filter, never guess at its bits
              val known = u1(2) && u1(3) && u1(4)
              fiOpt(md, 15).foreach { l =>
                if (l != (tr2.pos - bo) + numBytes) throw Malformed
              }
              if (tr2.pos + numBytes > fStart) throw Malformed
              if (known && collect != null) {
                val nBlocks = (numBytes / 32).toInt
                val words = Array.tabulate(nBlocks * 8) { i =>
                  val p = tr2.pos + 4 * i
                  (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
                    ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
                }
                collect.foreach { v =>
                  if (!ParquetCodec.Sbbf.check(words, nBlocks,
                    ParquetCodec.Sbbf.hashInt64(v))) throw Malformed
                }
              }
            }
            // nested ROW audit: a LIST chunk's repetition-0 count IS
            // the row count, and it must tile the row group exactly
            if (maxRep > 0 && rows0 != rgRows) throw Malformed
            // ---- the PAGE-INDEX audit (d175): OffsetIndex locations
            // and ColumnIndex per-page bounds vs the pages actually
            // walked — page-granular pruning metadata is what a 100 TB
            // scan SKIPS data over, so a page-level lie silently drops
            // real rows; recompute, never trust
            def declI64(v: Array[Byte]): Long = le64of(v)
            def declF32(v: Array[Byte]): Int = {
              if (v.length != 4) throw Malformed
              (v(0) & 0xFF) | ((v(1) & 0xFF) << 8) |
                ((v(2) & 0xFF) << 16) | ((v(3) & 0xFF) << 24)
            }
            fiOpt(cc, 4).foreach { oiOff => // offset_index_offset
              if (oiOff < 4 || oiOff >= fStart) throw Malformed
              val tr2 = new TReader(b, oiOff.toInt, fStart)
              val oi = tr2.struct()
              fiOpt(cc, 5).foreach(l =>
                if (l != tr2.pos - oiOff) throw Malformed)
              val locs = flist(oi, 1).map {
                case s: TStruct => s
                case _ => throw Malformed
              }
              if (locs.length != pageRecs.length) throw Malformed
              var firstRow = 0L
              locs.zip(pageRecs).foreach { case (pl, rec) =>
                if (fi(pl, 1) != rec.off) throw Malformed
                if (fi(pl, 2) != rec.size) throw Malformed
                // the ROW-SKIP lie: a wrong first_row_index shifts
                // every row a reader seeks past this page
                if (fi(pl, 3) != firstRow) throw Malformed
                firstRow += rec.rows
              }
            }
            fiOpt(cc, 6).foreach { ciOff => // column_index_offset
              if (ciOff < 4 || ciOff >= fStart) throw Malformed
              val tr2 = new TReader(b, ciOff.toInt, fStart)
              val ci = tr2.struct()
              fiOpt(cc, 7).foreach(l =>
                if (l != tr2.pos - ciOff) throw Malformed)
              val nullPages = flist(ci, 1).map {
                case TBool(v) => v
                case _ => throw Malformed
              }
              val minVs = flist(ci, 2).map {
                case TBin(v) => v
                case _ => throw Malformed
              }
              val maxVs = flist(ci, 3).map {
                case TBin(v) => v
                case _ => throw Malformed
              }
              val order = fi(ci, 4)
              if (order < 0 || order > 2) throw Malformed
              val nullCounts = fld(ci, 5) match {
                case Some(TList(vs)) => Some(vs.map {
                  case TI(v) => v
                  case _ => throw Malformed
                })
                case None => None
                case _ => throw Malformed
              }
              val np = pageRecs.length
              if (nullPages.length != np || minVs.length != np ||
                  maxVs.length != np) throw Malformed
              nullCounts.foreach(ncs => if (ncs.length != np) throw Malformed)
              pageRecs.zipWithIndex.foreach { case (rec, i) =>
                // a page with no values must be FLAGGED null, and a
                // flagged page must have none (the coverage lie)
                if (nullPages(i) != (rec.present == 0L)) throw Malformed
                nullCounts.foreach(ncs =>
                  if (ncs(i) != rec.nulls) throw Malformed)
                if (!nullPages(i)) tpe match {
                  case T_INT64 =>
                    if (declI64(minVs(i)) != rec.minI ||
                        declI64(maxVs(i)) != rec.maxI) throw Malformed
                  case T_FLOAT =>
                    if (declF32(minVs(i)) !=
                          java.lang.Float.floatToIntBits(rec.minF) ||
                        declF32(maxVs(i)) !=
                          java.lang.Float.floatToIntBits(rec.maxF))
                      throw Malformed
                  case _ =>
                    // binary bounds may be TRUNCATED (parquet-mr
                    // default 64 bytes): audit as BOUNDS when the
                    // decode path materialized values, else as
                    // internal consistency
                    if (rec.exactB && rec.minB != null) {
                      if (lexCmp(minVs(i), rec.minB) > 0 ||
                          lexCmp(maxVs(i), rec.maxB) < 0) throw Malformed
                    } else if (lexCmp(minVs(i), maxVs(i)) > 0)
                      throw Malformed
                }
              }
              // boundary_order is a CLAIM scans sort-merge on: verify
              // the claimed monotonicity of the declared bounds
              if (order != 0) {
                def cmpDecl(x: Array[Byte], y: Array[Byte]): Int = tpe match {
                  case T_INT64 => java.lang.Long.compare(declI64(x), declI64(y))
                  case T_FLOAT => java.lang.Float.compare(
                    java.lang.Float.intBitsToFloat(declF32(x)),
                    java.lang.Float.intBitsToFloat(declF32(y)))
                  case _ => lexCmp(x, y)
                }
                val live = pageRecs.indices.filterNot(nullPages)
                live.sliding(2).foreach {
                  case Seq(a2, b2) =>
                    val cMin = cmpDecl(minVs(a2), minVs(b2))
                    val cMax = cmpDecl(maxVs(a2), maxVs(b2))
                    if (order == 1 && (cMin > 0 || cMax > 0)) throw Malformed
                    if (order == 2 && (cMin < 0 || cMax < 0)) throw Malformed
                  case _ =>
                }
              }
            }
            // the stats AUDIT: declared vs recomputed
            fld(md, 12).foreach {
              case st: TStruct =>
                fiOpt(st, 3).foreach(nc => if (nc != nulls) throw Malformed)
                if (tpe == T_INT64 && seen > nulls) {
                  st.f.get(5).foreach {
                    case TBin(v) => if (le64of(v) != mx) throw Malformed
                    case _ => throw Malformed
                  }
                  st.f.get(6).foreach {
                    case TBin(v) => if (le64of(v) != mn) throw Malformed
                    case _ => throw Malformed
                  }
                }
                if (tpe == T_FLOAT && seen > nulls) {
                  def f32bits(v: Array[Byte]): Int = {
                    if (v.length != 4) throw Malformed
                    (v(0) & 0xFF) | ((v(1) & 0xFF) << 8) |
                      ((v(2) & 0xFF) << 16) | ((v(3) & 0xFF) << 24)
                  }
                  st.f.get(5).foreach {
                    case TBin(v) =>
                      if (f32bits(v) != java.lang.Float.floatToIntBits(fmx))
                        throw Malformed
                    case _ => throw Malformed
                  }
                  st.f.get(6).foreach {
                    case TBin(v) =>
                      if (f32bits(v) != java.lang.Float.floatToIntBits(fmn))
                        throw Malformed
                    case _ => throw Malformed
                  }
                }
              case _ => throw Malformed
            }
            val prev = acc.getOrElse(path,
              ColResult(path, tpe, 0L, 0L, 0L, Long.MaxValue, Long.MinValue, 0L))
            acc(path) = prev.copy(
              numValues = prev.numValues + numValues,
              nulls = prev.nulls + nulls,
              sumInt = prev.sumInt + sum,
              minInt = math.min(prev.minInt, mn),
              maxInt = math.max(prev.maxInt, mx),
              byteLen = prev.byteLen + blen,
              rows = prev.rows + rows0,
              nullLists = prev.nullLists + nullL,
              emptyLists = prev.emptyLists + emptyL,
              sumF = prev.sumF + fsum,
              minF = math.min(prev.minF, fmn.toDouble),
              maxF = math.max(prev.maxF, fmx.toDouble))
          case _ => throw Malformed
        }
      }
      if (rowsSeen != numRows) throw Malformed
      Some(PqInfo(numRows, rowGroups.length, nPages, acc.values.toSeq))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      case _: MatchError => None
    }
}

/** In-plan synthesizer + gate for d126 — the d123 discipline aimed at
  * the warehouse format itself: each doc becomes a parquet file of
  * K = 3 + doc_id%5 rows (ids/vals closed forms, text = the d111
  * codepoint slices so the bytes are REAL corpus text), two rows per
  * row group, pages compressed through the codec ROTATION doc_id%4 →
  * uncompressed/snappy/gzip/zstd — every entropy layer in the repo
  * running inside the format every 100 TB scan depends on. The walk
  * recomputes row counts, column sums and statistics from the pages
  * and AUDITS the footer's claims.
  *
  * Damage slice on doc_id%7: 0 → truncation (footer length/magic
  * gone); 3 → a LYING max_value on the `val` column's first row
  * group — every page intact, every size right, only the
  * stats-vs-recomputed audit catches it (the lie that silently
  * mis-prunes a production scan); 5 → a LYING page num_values —
  * the page no longer tiles exactly. */
object ParquetSim {

  private[graft] def nRows(docId: Long): Int = (3 + docId % 5).toInt

  private[graft] def codecFor(docId: Long): Int = (docId % 4) match {
    case 0 => 0 // uncompressed
    case 1 => 1 // snappy (ours)
    case 2 => 2 // gzip (ours)
    case _ => 6 // zstd (ours)
  }

  private[graft] def rowsFor(docId: Long, text: String): Seq[(Long, Long, String)] = {
    val k = nRows(docId)
    val cps = text.codePointCount(0, text.length)
    (0 until k).map { j =>
      val a = text.offsetByCodePoints(0, (j.toLong * cps / k).toInt)
      val b = text.offsetByCodePoints(0, ((j + 1).toLong * cps / k).toInt)
      (docId * 1000 + j, (docId * 7 + j * 13) % 1000, text.substring(a, b))
    }
  }

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val rows = rowsFor(docId, text)
    val codec = codecFor(docId)
    (docId % 7) match {
      case 0 =>
        val clean = ParquetFile.write(rows, 2, codec)
        java.util.Arrays.copyOf(clean, clean.length - 5)
      case 3 => ParquetFile.write(rows, 2, codec, lieStats = true)
      case 5 => ParquetFile.write(rows, 2, codec, lieNumValues = true)
      case _ => ParquetFile.write(rows, 2, codec)
    }
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_rowgroups", LongType),
    StructField("n_rows", LongType),
    StructField("sum_ids", LongType),
    StructField("sum_vals", LongType),
    StructField("text_bytes", LongType)))

  /** Batched strict walk + audit → per-doc stats with quarantine. */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            ParquetFile.read(payloadFor(id, text)) match {
              case Some(info) =>
                val ids = info.cols.find(_.path == "doc_id")
                val vs = info.cols.find(_.path == "val")
                val tx = info.cols.find(_.path == "text")
                if (ids.isEmpty || vs.isEmpty || tx.isEmpty)
                  Row(id, "quarantined", null, null, null, null, null)
                else
                  Row(id, "ok", info.nRowGroups.toLong, info.numRows,
                    ids.get.sumInt, vs.get.sumInt, tx.get.byteLen)
              case None =>
                Row(id, "quarantined", null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}

/** d135 — the V2 twin of [[ParquetSim]]: the same logical table
  * written through DATA_PAGE_V2 + the DELTA encodings
  * (DELTA_BINARY_PACKED ints, DELTA_BYTE_ARRAY text), levels outside
  * the compressed region, the same codec rotation. The oracle is
  * d126's verbatim — one logical table, two physical writers, both
  * must replay to the same answer. Damage %7: truncation / the lying
  * max_value (the audit class, now through v2 pages) / a LYING
  * num_nulls in the v2 page header — the v2-specific field only the
  * definition-level audit catches. */
object ParquetV2Sim {

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val rows = ParquetSim.rowsFor(docId, text)
    val codec = ParquetSim.codecFor(docId)
    (docId % 7) match {
      case 0 =>
        val clean = ParquetFile.writeV2(rows, 2, codec)
        java.util.Arrays.copyOf(clean, clean.length - 5)
      case 3 => ParquetFile.writeV2(rows, 2, codec, lieStats = true)
      case 5 => ParquetFile.writeV2(rows, 2, codec, lieNumNulls = true)
      case _ => ParquetFile.writeV2(rows, 2, codec)
    }
  }

  /** Batched strict walk + audit → per-doc stats with quarantine. */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(ParquetSim.statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            ParquetFile.read(payloadFor(id, text)) match {
              case Some(info) =>
                val ids = info.cols.find(_.path == "doc_id")
                val vs = info.cols.find(_.path == "val")
                val tx = info.cols.find(_.path == "text")
                if (ids.isEmpty || vs.isEmpty || tx.isEmpty)
                  Row(id, "quarantined", null, null, null, null, null)
                else
                  Row(id, "ok", info.nRowGroups.toLong, info.numRows,
                    ids.get.sumInt, vs.get.sumInt, tx.get.byteLen)
              case None =>
                Row(id, "quarantined", null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}

/** d138 — the bloom twin: the same logical table with split-block
  * bloom filters on the INT64 chunks, membership-AUDITED at read (the
  * third pruning structure after d126's stats and d136's index).
  * Damage %7: truncation / the lying max stat / a CLEARED BLOOM BIT —
  * every page, stat and checksum intact; the filter simply answers
  * "absent" for a row that exists, which is exactly how a corrupted
  * filter silently drops data from a 100 TB scan. */
object ParquetBloomSim {

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val rows = ParquetSim.rowsFor(docId, text)
    val codec = ParquetSim.codecFor(docId)
    (docId % 7) match {
      case 0 =>
        val clean = ParquetFile.write(rows, 2, codec, blooms = true)
        java.util.Arrays.copyOf(clean, clean.length - 5)
      case 3 => ParquetFile.write(rows, 2, codec, lieStats = true, blooms = true)
      case 5 => ParquetFile.write(rows, 2, codec, blooms = true, lieBloom = true)
      case _ => ParquetFile.write(rows, 2, codec, blooms = true)
    }
  }

  /** Batched strict walk + stats AND bloom audit → per-doc stats. */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(ParquetSim.statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            ParquetFile.read(payloadFor(id, text)) match {
              case Some(info) =>
                val ids = info.cols.find(_.path == "doc_id")
                val vs = info.cols.find(_.path == "val")
                val tx = info.cols.find(_.path == "text")
                if (ids.isEmpty || vs.isEmpty || tx.isEmpty)
                  Row(id, "quarantined", null, null, null, null, null)
                else
                  Row(id, "ok", info.nRowGroups.toLong, info.numRows,
                    ids.get.sumInt, vs.get.sumInt, tx.get.byteLen)
              case None =>
                Row(id, "quarantined", null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}

/** d171 — NESTED LIST columns through the same strict walk: the
  * (doc_id int64, emb array<float>) table in the standard 3-level
  * layout Spark writes for embedding shards (repetition + definition
  * levels, the full ladder: null list / empty list / null element /
  * value), v1 pages for even docs and v2 pages for odd ones (both
  * page forms through one gate), the d126 codec rotation. The walk
  * recomputes rows from the REPETITION levels, splits the definition
  * ladder, sums the float elements, and audits the footer's claims —
  * float min/max statistics bit-compared, null_count vs the def
  * levels, and the nested ROW audit (rep-0 count must tile the row
  * group; v2 num_rows must agree with the rep levels themselves).
  *
  * Damage %7: 0 → truncation; 3 → a LYING element max_value (the
  * audit class through the nested column); 5 → the STRUCTURAL lie —
  * v2 declares num_rows one high (a wrong row count re-chunks every
  * list; only the rep-level audit catches it), v1 inflates the
  * declared num_values (the level sections no longer tile). */
object ParquetNestedSim {

  private[graft] def nRows(docId: Long): Int = (3 + docId % 5).toInt

  /** Closed-form nested rows: shape by (docId+i)%4 — null list /
    * empty list / L floats / L floats with index 1 null; values are
    * quarter-integers, exactly representable, so every float sum
    * replays exactly in the DuckDB oracle. */
  private[graft] def rowsFor(docId: Long): Seq[ParquetFile.NestedRow] =
    (0 until nRows(docId)).map { i =>
      val id = docId * 100 + i
      val shape = ((docId + i) % 4).toInt
      val len = (2 + (docId + i) % 3).toInt
      def f(j: Int): Float = ((docId * 7 + i * 13 + j * 3) % 1000) / 4.0f
      shape match {
        case 0 => (id, None)
        case 1 => (id, Some(Seq.empty[Option[Float]]))
        case 2 => (id, Some((0 until len).map(j => Some(f(j)): Option[Float])))
        case _ => (id, Some((0 until len).map(j =>
          if (j == 1) None: Option[Float] else Some(f(j)))))
      }
    }

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val rows = rowsFor(docId)
    val codec = ParquetSim.codecFor(docId)
    val v2 = docId % 2 == 1
    (docId % 7) match {
      case 0 =>
        val clean = ParquetFile.writeNested(rows, 2, codec, v2)
        java.util.Arrays.copyOf(clean, clean.length - 5)
      case 3 => ParquetFile.writeNested(rows, 2, codec, v2, lieStats = true)
      case 5 => ParquetFile.writeNested(rows, 2, codec, v2, lieRows = true)
      case _ => ParquetFile.writeNested(rows, 2, codec, v2)
    }
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_rows", LongType),
    StructField("n_null_lists", LongType),
    StructField("n_empty_lists", LongType),
    StructField("n_null_elems", LongType),
    StructField("n_elems", LongType),
    StructField("sum_elems", DoubleType),
    StructField("sum_ids", LongType)))

  /** Batched strict walk + audit → per-doc nested stats. */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            ParquetFile.read(payloadFor(id)) match {
              case Some(info) =>
                val ids = info.cols.find(_.path == "doc_id")
                val emb = info.cols.find(_.path == "emb.list.element")
                if (ids.isEmpty || emb.isEmpty)
                  Row(id, "quarantined", null, null, null, null, null, null, null)
                else {
                  val e = emb.get
                  Row(id, "ok", e.rows,
                    e.nullLists, e.emptyLists,
                    e.nulls - e.nullLists - e.emptyLists,
                    e.numValues - e.nulls,
                    e.sumF, ids.get.sumInt)
                }
              case None =>
                Row(id, "quarantined", null, null, null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}

/** d175 — the PAGE INDEX (ColumnIndex + OffsetIndex): page-granular
  * pruning metadata is the structure a 100 TB scan uses to SKIP pages
  * inside a chunk (predicate pushdown below row-group granularity)
  * and to seek rows (first_row_index) — lies here silently drop real
  * data, and the CHUNK-level stats stay true while a PAGE-level bound
  * lies, so only a page-granular audit can catch them. Same logical
  * table as d126, written in 2-row pages (multiple pages per chunk —
  * what makes the index mean anything), indexes after the data region
  * in the parquet-mr layout, the four ColumnChunk offset/length
  * fields set. The walk recomputes per-page bounds / null counts /
  * row offsets and audits every claim, including the boundary_order
  * monotonicity CLAIM (what scans sort-merge on). Interop: real
  * parquet-mr files (which write page indexes by default) pass the
  * same audit in ParquetInteropSpec / ParquetNestedSpec.
  *
  * Damage %7: 0 → truncation; 3 → the first row group's `val`
  * ColumnIndex max_values[0] ONE LOW (chunk stats true, pages intact
  * — the page-pruning lie only this audit catches); 5 → the second
  * page's first_row_index ONE HIGH (the row-seek lie). */
object ParquetPageIdxSim {

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val rows = ParquetSim.rowsFor(docId, text)
    val codec = ParquetSim.codecFor(docId)
    (docId % 7) match {
      case 0 =>
        val clean = ParquetFile.writePaged(rows, 4, 2, codec)
        java.util.Arrays.copyOf(clean, clean.length - 5)
      case 3 => ParquetFile.writePaged(rows, 4, 2, codec, liePageMax = true)
      case 5 => ParquetFile.writePaged(rows, 4, 2, codec, lieFirstRow = true)
      case _ => ParquetFile.writePaged(rows, 4, 2, codec)
    }
  }

  /** Batched strict walk + audit → per-doc stats with quarantine. */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(ParquetSim.statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            ParquetFile.read(payloadFor(id, text)) match {
              case Some(info) =>
                val ids = info.cols.find(_.path == "doc_id")
                val vs = info.cols.find(_.path == "val")
                val tx = info.cols.find(_.path == "text")
                if (ids.isEmpty || vs.isEmpty || tx.isEmpty)
                  Row(id, "quarantined", null, null, null, null, null)
                else
                  Row(id, "ok", info.nRowGroups.toLong, info.numRows,
                    ids.get.sumInt, vs.get.sumInt, tx.get.byteLen)
              case None =>
                Row(id, "quarantined", null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
