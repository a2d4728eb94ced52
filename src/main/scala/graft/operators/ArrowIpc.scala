package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Apache Arrow IPC (streaming format) — the interchange format Spark
  * itself ships columns through (pandas UDFs, `toPandas`, arrow-based
  * collect) — implemented from the published specification
  * (arrow.apache.org/docs/format/Columnar.html + Message.fbs /
  * Schema.fbs), BOTH directions, with no borrowed primitive:
  *
  *  - a from-scratch FLATBUFFERS walk and builder (the THIRD
  *    serialization framework done by hand, after thrift-compact
  *    (d126) and protobuf (d120/d133)): root uoffset, vtable
  *    resolution (soffset, per-slot 16-bit offsets, absent-field
  *    defaults), strings/vectors/struct-vectors/unions, every access
  *    bounds-checked so a hostile buffer can never read outside the
  *    message;
  *  - the ENCAPSULATED MESSAGE grammar: 0xFFFFFFFF continuation,
  *    32-bit little-endian metadata size (8-byte alignment enforced),
  *    the Message table (version, header union, bodyLength), the body
  *    region, and the 8-byte end-of-stream marker (a stream that just
  *    stops, or carries bytes past EOS, QUARANTINES);
  *  - schema messages for the flat scope Int64 / Float64 / Utf8
  *    (nullable): union tag dispatch with unknown/out-of-scope types
  *    (dictionaries, nesting, Big endianness, compression) rejected,
  *    never guessed;
  *  - record batches: FieldNode / Buffer struct vectors, per-column
  *    buffer assembly (validity bitmap, data, utf8 offsets), every
  *    buffer 8-aligned and bounded by bodyLength;
  *  - THE AUDITS (the d126/d133 stats discipline at the interchange
  *    layer): the declared null_count is RECOUNTED from the validity
  *    bitmap (a reader that trusts the count skips nulls that exist —
  *    or fabricates them); utf8 offsets must start at 0, be
  *    monotonically non-decreasing, and end inside the data buffer
  *    (the incremental-decode overrun class).
  *
  * Interop is pinned BOTH directions against arrow-vector 18.3 (the
  * library on Spark's own classpath): real ArrowStreamWriter bytes —
  * nulls, multi-batch, empty strings — walk through this reader with
  * the audits ON, and this writer's streams read back row-identical
  * through ArrowStreamReader (ArrowIpcSpec).
  */
object FlatBuf {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Bounds-checked flatbuffers walker over one message buffer. */
  final class Walk(val b: Array[Byte]) {
    private def chk(p: Int, n: Int): Unit =
      if (p < 0 || n < 0 || p + n > b.length) throw Malformed
    def u8(p: Int): Int = { chk(p, 1); b(p) & 0xff }
    def u16(p: Int): Int = { chk(p, 2); (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) }
    def i16(p: Int): Int = u16(p).toShort.toInt
    def i32(p: Int): Int = {
      chk(p, 4)
      (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
        ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    }
    def i64(p: Int): Long = (i32(p) & 0xffffffffL) | (i32(p + 4).toLong << 32)
    /** Follow a uoffset at p (table/vector/string reference). */
    def indirect(p: Int): Int = {
      val off = i32(p)
      if (off <= 0) throw Malformed
      val t = p.toLong + off
      if (t > b.length) throw Malformed
      t.toInt
    }
    /** Root table position. */
    def root: Int = indirect(0)
    /** Absolute position of field `slot` in the table at `tab`;
      * -1 when the field is absent (default applies). */
    def field(tab: Int, slot: Int): Int = {
      val so = i32(tab)
      val vt = tab.toLong - so
      if (vt < 0 || vt + 4 > b.length) throw Malformed
      val vtSize = u16(vt.toInt)
      val entry = 4 + 2 * slot
      if (entry + 2 > vtSize) -1
      else {
        val fo = u16(vt.toInt + entry)
        if (fo == 0) -1 else tab + fo
      }
    }
    def i16Field(tab: Int, slot: Int, dflt: Int): Int = {
      val p = field(tab, slot); if (p < 0) dflt else i16(p)
    }
    def u8Field(tab: Int, slot: Int, dflt: Int): Int = {
      val p = field(tab, slot); if (p < 0) dflt else u8(p)
    }
    def i32Field(tab: Int, slot: Int, dflt: Int): Int = {
      val p = field(tab, slot); if (p < 0) dflt else i32(p)
    }
    def i64Field(tab: Int, slot: Int, dflt: Long): Long = {
      val p = field(tab, slot); if (p < 0) dflt else i64(p)
    }
    def boolField(tab: Int, slot: Int, dflt: Boolean): Boolean = {
      val p = field(tab, slot); if (p < 0) dflt else u8(p) != 0
    }
    /** Table-valued field → table position, -1 if absent. */
    def tableField(tab: Int, slot: Int): Int = {
      val p = field(tab, slot); if (p < 0) -1 else indirect(p)
    }
    /** Vector at position v: (length, first-element position). */
    def vector(v: Int, elemSize: Int): (Int, Int) = {
      val n = i32(v)
      if (n < 0) throw Malformed
      chk(v + 4, n.toLong * elemSize match {
        case sz if sz > Int.MaxValue => throw Malformed
        case sz => sz.toInt
      })
      (n, v + 4)
    }
    def string(v: Int): String = {
      val n = i32(v)
      if (n < 0) throw Malformed
      chk(v + 4, n)
      CharsetSniff.decodeUtf8(b, v + 4, v + 4 + n)
    }
  }

  /** Minimal flatbuffers builder (grow-down, flatbuffers-java's
    * construction order), enough for the Arrow message schemas. */
  final class Builder {
    private var buf = new Array[Byte](512)
    private var pos = 0 // bytes used, counted from the END of buf

    private def ensure(n: Int): Unit =
      if (pos + n > buf.length) {
        val nb = new Array[Byte](math.max(buf.length * 2, pos + n))
        System.arraycopy(buf, buf.length - pos, nb, nb.length - pos, pos)
        buf = nb
      }
    private def put(n: Int): Int = { ensure(n); pos += n; buf.length - pos }
    /** Pad so that, after `extra` more bytes, pos ≡ 0 (mod align). */
    private def prep(align: Int, extra: Int): Unit =
      while ((pos + extra) % align != 0) { val i = put(1); buf(i) = 0 }

    def i8(v: Int): Unit = { val i = put(1); buf(i) = v.toByte }
    def i16(v: Int): Unit = {
      prep(2, 0); val i = put(2)
      buf(i) = v.toByte; buf(i + 1) = (v >> 8).toByte
    }
    def i32(v: Int): Unit = {
      prep(4, 0); val i = put(4)
      var k = 0
      while (k < 4) { buf(i + k) = (v >> (8 * k)).toByte; k += 1 }
    }
    def i64(v: Long): Unit = {
      prep(8, 0); val i = put(8)
      var k = 0
      while (k < 8) { buf(i + k) = (v >> (8 * k)).toByte; k += 1 }
    }
    /** Reference to an object previously finished at `loc`. */
    def uoffset(loc: Int): Unit = {
      prep(4, 0)
      val v = pos + 4 - loc
      val i = put(4)
      var k = 0
      while (k < 4) { buf(i + k) = (v >> (8 * k)).toByte; k += 1 }
    }
    def createString(s: String): Int = {
      val bytes = s.getBytes("UTF-8")
      prep(4, bytes.length + 1)
      i8(0) // NUL terminator
      val i = put(bytes.length)
      System.arraycopy(bytes, 0, buf, i, bytes.length)
      prep(4, 0)
      i32(bytes.length)
      pos
    }
    /** Vector of uoffsets to already-built objects (in logical order). */
    def createOffsetVector(locs: Seq[Int]): Int = {
      prep(4, 4 * locs.length + 4)
      locs.reverse.foreach(uoffset)
      i32(locs.length)
      pos
    }
    /** Vector of 16-byte (i64, i64) structs (FieldNode / Buffer). */
    def createStructVector16(elems: Seq[(Long, Long)]): Int = {
      prep(8, 16 * elems.length)
      prep(4, 16 * elems.length + 4)
      elems.reverse.foreach { case (a, b2) => i64(b2); i64(a) }
      i32(elems.length)
      pos
    }

    private var slots: Array[Int] = _
    private var tableStartPos = 0
    def startTable(numSlots: Int): Unit = {
      slots = new Array[Int](numSlots)
      tableStartPos = pos
    }
    def slot(i: Int): Unit = slots(i) = pos
    def slotI8(i: Int, v: Int): Unit = { i8(v); slot(i) }
    def slotI16(i: Int, v: Int): Unit = { i16(v); slot(i) }
    def slotI32(i: Int, v: Int): Unit = { i32(v); slot(i) }
    def slotI64(i: Int, v: Long): Unit = { i64(v); slot(i) }
    def slotRef(i: Int, loc: Int): Unit = { uoffset(loc); slot(i) }
    def endTable(): Int = {
      prep(4, 0)
      val soffsetIdx = put(4) // patched below
      val tableLoc = pos
      // vtable: per-slot entries (reverse), table size, vtable size
      var i = slots.length - 1
      while (i >= 0) {
        i16(if (slots(i) == 0) 0 else tableLoc - slots(i))
        i -= 1
      }
      i16(tableLoc - tableStartPos)
      i16(4 + 2 * slots.length)
      val vtLoc = pos
      val so = vtLoc - tableLoc
      var k = 0
      while (k < 4) { buf(soffsetIdx + k) = (so >> (8 * k)).toByte; k += 1 }
      tableLoc
    }

    def finish(rootLoc: Int): Array[Byte] = {
      prep(8, 4)
      uoffset(rootLoc)
      java.util.Arrays.copyOfRange(buf, buf.length - pos, buf.length)
    }
  }
}

/** The Arrow IPC stream codec over the flat gate scope. */
object ArrowIpc {
  import FlatBuf.Malformed

  sealed trait AType
  case object AInt64 extends AType
  case object AFloat64 extends AType
  case object AUtf8 extends AType

  final case class AField(name: String, nullable: Boolean, tpe: AType)

  /** One decoded column: `valid(i)` gates `longs/doubles/strs(i)`. */
  final case class ACol(valid: Array[Boolean], longs: Array[Long],
      doubles: Array[Double], strs: Array[String])
  final case class ABatch(nRows: Int, cols: Seq[ACol])

  // MessageHeader union tags (Message.fbs)
  private val H_SCHEMA = 1
  private val H_RECORDBATCH = 3
  // Type union tags (Schema.fbs)
  private val T_INT = 2
  private val T_FP = 3
  private val T_UTF8 = 5

  // ------------------------------------------------------------- reader

  private def parseSchema(w: FlatBuf.Walk, tab: Int): Seq[AField] = {
    if (w.i16Field(tab, 0, 0) != 0) throw Malformed // Big endianness
    val fv = w.field(tab, 1)
    if (fv < 0) throw Malformed
    val (n, first) = w.vector(w.indirect(fv), 4)
    (0 until n).map { i =>
      val f = w.indirect(first + 4 * i)
      val nameP = w.field(f, 0)
      if (nameP < 0) throw Malformed
      val name = w.string(w.indirect(nameP))
      val nullable = w.boolField(f, 1, dflt = false)
      if (w.field(f, 4) >= 0) throw Malformed // dictionary: out of scope
      val chP = w.field(f, 5)
      if (chP >= 0 && w.vector(w.indirect(chP), 4)._1 != 0) throw Malformed
      val tpe = w.u8Field(f, 2, 0) match {
        case T_INT =>
          val t = w.tableField(f, 3)
          if (t < 0 || w.i32Field(t, 0, 0) != 64 ||
            !w.boolField(t, 1, dflt = false)) throw Malformed
          AInt64
        case T_FP =>
          val t = w.tableField(f, 3)
          if (t < 0 || w.i16Field(t, 0, 0) != 2) throw Malformed // DOUBLE
          AFloat64
        case T_UTF8 => AUtf8
        case _ => throw Malformed // out of scope: never guessed at
      }
      AField(name, nullable, tpe)
    }
  }

  /** Recount nulls from a validity buffer; audit vs the declared count. */
  private def validity(body: Array[Byte], off: Long, len: Long, rows: Int,
      declaredNulls: Long): Array[Boolean] = {
    val v = new Array[Boolean](rows)
    if (len == 0) {
      if (declaredNulls != 0) throw Malformed
      java.util.Arrays.fill(v, true)
    } else {
      if (len < (rows + 7) / 8) throw Malformed
      var nulls = 0L
      var i = 0
      while (i < rows) {
        val bit = (body((off + i / 8).toInt) >> (i % 8)) & 1
        v(i) = bit != 0
        if (bit == 0) nulls += 1
        i += 1
      }
      if (nulls != declaredNulls) throw Malformed // the null_count AUDIT
    }
    v
  }

  private def parseBatch(w: FlatBuf.Walk, tab: Int, body: Array[Byte],
      fields: Seq[AField]): ABatch = {
    val rows64 = w.i64Field(tab, 0, 0L)
    if (rows64 < 0 || rows64 > Int.MaxValue) throw Malformed
    val rows = rows64.toInt
    if (w.field(tab, 3) >= 0) throw Malformed // compression: out of scope
    if (w.field(tab, 4) >= 0) throw Malformed // variadicBufferCounts
    val nodesP = w.field(tab, 1)
    val bufsP = w.field(tab, 2)
    if (nodesP < 0 || bufsP < 0) throw Malformed
    val (nNodes, nodes0) = w.vector(w.indirect(nodesP), 16)
    val (nBufs, bufs0) = w.vector(w.indirect(bufsP), 16)
    if (nNodes != fields.length) throw Malformed
    val needBufs = fields.map { f => if (f.tpe == AUtf8) 3 else 2 }.sum
    if (nBufs != needBufs) throw Malformed
    def buffer(i: Int): (Long, Long) = {
      val p = bufs0 + 16 * i
      val off = w.i64(p)
      val len = w.i64(p + 8)
      if (off < 0 || len < 0 || off % 8 != 0 ||
        off + len > body.length) throw Malformed
      (off, len)
    }
    var bi = 0
    val cols = fields.zipWithIndex.map { case (f, fi) =>
      val nodeLen = w.i64(nodes0 + 16 * fi)
      val nodeNulls = w.i64(nodes0 + 16 * fi + 8)
      if (nodeLen != rows || nodeNulls < 0) throw Malformed
      val (voff, vlen) = buffer(bi); bi += 1
      val valid = validity(body, voff, vlen, rows, nodeNulls)
      f.tpe match {
        case AInt64 =>
          val (doff, dlen) = buffer(bi); bi += 1
          if (dlen < 8L * rows) throw Malformed
          val a = new Array[Long](rows)
          var i = 0
          while (i < rows) {
            if (valid(i)) {
              var v = 0L
              var k = 0
              while (k < 8) {
                v |= (body((doff + 8L * i + k).toInt) & 0xffL) << (8 * k)
                k += 1
              }
              a(i) = v
            }
            i += 1
          }
          ACol(valid, a, null, null)
        case AFloat64 =>
          val (doff, dlen) = buffer(bi); bi += 1
          if (dlen < 8L * rows) throw Malformed
          val a = new Array[Double](rows)
          var i = 0
          while (i < rows) {
            if (valid(i)) {
              var v = 0L
              var k = 0
              while (k < 8) {
                v |= (body((doff + 8L * i + k).toInt) & 0xffL) << (8 * k)
                k += 1
              }
              a(i) = java.lang.Double.longBitsToDouble(v)
            }
            i += 1
          }
          ACol(valid, null, a, null)
        case AUtf8 =>
          val (ooff, olen) = buffer(bi); bi += 1
          val (doff, dlen) = buffer(bi); bi += 1
          if (olen < 4L * (rows + 1)) throw Malformed
          val offs = new Array[Int](rows + 1)
          var i = 0
          while (i <= rows) {
            var v = 0
            var k = 0
            while (k < 4) {
              v |= (body((ooff + 4L * i + k).toInt) & 0xff) << (8 * k)
              k += 1
            }
            offs(i) = v
            i += 1
          }
          // the offsets AUDIT: zero-based, monotone, inside the data
          if (rows >= 0 && offs(0) != 0) throw Malformed
          i = 0
          while (i < rows) {
            if (offs(i + 1) < offs(i)) throw Malformed
            i += 1
          }
          if (offs(rows) > dlen) throw Malformed
          val a = new Array[String](rows)
          i = 0
          while (i < rows) {
            if (valid(i))
              a(i) = CharsetSniff.decodeUtf8(body, (doff + offs(i)).toInt,
                (doff + offs(i + 1)).toInt)
            i += 1
          }
          ACol(valid, null, null, a)
      }
    }
    ABatch(rows, cols)
  }

  /** Strict stream decode; None quarantines. */
  def decode(bytes: Array[Byte]): Option[(Seq[AField], Seq[ABatch])] =
    try {
      var pos = 0
      def i32at(p: Int): Int = {
        if (p + 4 > bytes.length) throw Malformed
        (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
          ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
      }
      var fields: Seq[AField] = null
      val batches = Seq.newBuilder[ABatch]
      var eos = false
      while (!eos) {
        if (i32at(pos) != -1) throw Malformed // continuation 0xFFFFFFFF
        val mlen = i32at(pos + 4)
        if (mlen == 0) {
          // end-of-stream marker: nothing may follow
          if (pos + 8 != bytes.length) throw Malformed
          eos = true
        } else {
          if (mlen < 0 || mlen % 8 != 0 ||
            pos + 8 + mlen > bytes.length) throw Malformed
          val fb = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + mlen)
          pos += 8 + mlen
          val w = new FlatBuf.Walk(fb)
          val msg = w.root
          val ver = w.i16Field(msg, 0, 0)
          if (ver != 3 && ver != 4) throw Malformed // V4 / V5
          val hType = w.u8Field(msg, 1, 0)
          val hTab = w.tableField(msg, 2)
          if (hTab < 0) throw Malformed
          val bodyLen = w.i64Field(msg, 3, 0L)
          if (bodyLen < 0 || bodyLen % 8 != 0 ||
            pos + bodyLen > bytes.length) throw Malformed
          val body = java.util.Arrays.copyOfRange(bytes, pos,
            (pos + bodyLen).toInt)
          pos = (pos + bodyLen).toInt
          hType match {
            case H_SCHEMA =>
              if (fields != null || bodyLen != 0) throw Malformed
              fields = parseSchema(w, hTab)
            case H_RECORDBATCH =>
              if (fields == null) throw Malformed
              batches += parseBatch(w, hTab, body, fields)
            case _ => throw Malformed // DictionaryBatch etc: out of scope
          }
        }
      }
      if (fields == null) throw Malformed
      Some((fields, batches.result()))
    } catch { case _: Throwable => None }

  // ------------------------------------------------------------- writer

  private def typeTable(b: FlatBuf.Builder, tpe: AType): (Int, Int) =
    tpe match {
      case AInt64 =>
        b.startTable(2)
        b.slotI32(0, 64)
        b.slotI8(1, 1)
        (T_INT, b.endTable())
      case AFloat64 =>
        b.startTable(1)
        b.slotI16(0, 2)
        (T_FP, b.endTable())
      case AUtf8 =>
        b.startTable(0)
        (T_UTF8, b.endTable())
    }

  private def schemaMessage(fields: Seq[AField]): Array[Byte] = {
    val b = new FlatBuf.Builder
    val fieldLocs = fields.map { f =>
      val (tag, tLoc) = typeTable(b, f.tpe)
      val nLoc = b.createString(f.name)
      b.startTable(7)
      b.slotRef(0, nLoc)
      if (f.nullable) b.slotI8(1, 1)
      b.slotI8(2, tag)
      b.slotRef(3, tLoc)
      b.endTable()
    }
    val fv = b.createOffsetVector(fieldLocs)
    b.startTable(4)
    b.slotRef(1, fv)
    val schema = b.endTable()
    b.startTable(4)
    b.slotI16(0, 4) // MetadataVersion V5
    b.slotI8(1, H_SCHEMA)
    b.slotRef(2, schema)
    val msg = b.endTable()
    b.finish(msg)
  }

  private def pad8(n: Int): Int = (n + 7) & ~7

  /** One column's buffers for the writer. */
  private def colBuffers(f: AField, col: ACol, rows: Int): Seq[Array[Byte]] = {
    val vb = new Array[Byte]((rows + 7) / 8)
    var i = 0
    while (i < rows) {
      if (col.valid(i)) vb(i / 8) = (vb(i / 8) | (1 << (i % 8))).toByte
      i += 1
    }
    f.tpe match {
      case AInt64 =>
        val db = new Array[Byte](8 * rows)
        i = 0
        while (i < rows) {
          if (col.valid(i)) {
            var k = 0
            while (k < 8) {
              db(8 * i + k) = (col.longs(i) >> (8 * k)).toByte; k += 1
            }
          }
          i += 1
        }
        Seq(vb, db)
      case AFloat64 =>
        val db = new Array[Byte](8 * rows)
        i = 0
        while (i < rows) {
          if (col.valid(i)) {
            val v = java.lang.Double.doubleToLongBits(col.doubles(i))
            var k = 0
            while (k < 8) { db(8 * i + k) = (v >> (8 * k)).toByte; k += 1 }
          }
          i += 1
        }
        Seq(vb, db)
      case AUtf8 =>
        val parts = (0 until rows).map { j =>
          if (col.valid(j)) col.strs(j).getBytes("UTF-8") else Array.empty[Byte]
        }
        val ob = new Array[Byte](4 * (rows + 1))
        var off = 0
        i = 0
        while (i <= rows) {
          var k = 0
          while (k < 4) { ob(4 * i + k) = (off >> (8 * k)).toByte; k += 1 }
          if (i < rows) off += parts(i).length
          i += 1
        }
        val db = new Array[Byte](off)
        var p = 0
        parts.foreach { bs => System.arraycopy(bs, 0, db, p, bs.length); p += bs.length }
        Seq(vb, ob, db)
    }
  }

  private def batchMessage(fields: Seq[AField], batch: ABatch,
      lieTextNullCount: Boolean, lieLastOffset: Boolean): Array[Byte] = {
    val rows = batch.nRows
    val raw = fields.zip(batch.cols).flatMap { case (f, c) =>
      colBuffers(f, c, rows)
    }
    // the lying-offsets damage: bump the final utf8 offset of the last
    // (text) column past its data buffer — every other byte intact
    val bufs =
      if (lieLastOffset && fields.last.tpe == AUtf8) {
        val ob = raw(raw.length - 2).clone()
        val p = ob.length - 4
        var v = (ob(p) & 0xff) | ((ob(p + 1) & 0xff) << 8) |
          ((ob(p + 2) & 0xff) << 16) | ((ob(p + 3) & 0xff) << 24)
        v += 1
        var k = 0
        while (k < 4) { ob(p + k) = (v >> (8 * k)).toByte; k += 1 }
        raw.updated(raw.length - 2, ob)
      } else raw
    var off = 0L
    val bufMeta = bufs.map { bb =>
      val m = (off, bb.length.toLong)
      off += pad8(bb.length)
      m
    }
    val bodyLen = off
    val nodes = fields.zip(batch.cols).map { case (f, c) =>
      var nulls = c.valid.count(!_).toLong
      if (lieTextNullCount && f.tpe == AUtf8) nulls += 1
      (rows.toLong, nulls)
    }
    val b = new FlatBuf.Builder
    val nodesV = b.createStructVector16(nodes)
    val bufsV = b.createStructVector16(bufMeta)
    b.startTable(5)
    b.slotI64(0, rows.toLong)
    b.slotRef(1, nodesV)
    b.slotRef(2, bufsV)
    val rb = b.endTable()
    b.startTable(4)
    b.slotI16(0, 4)
    b.slotI8(1, H_RECORDBATCH)
    b.slotRef(2, rb)
    b.slotI64(3, bodyLen)
    val msg = b.endTable()
    val fb = b.finish(msg)
    val out = new java.io.ByteArrayOutputStream
    writeFrame(out, fb)
    bufs.foreach { bb =>
      out.write(bb)
      var padCount = pad8(bb.length) - bb.length
      while (padCount > 0) { out.write(0); padCount -= 1 }
    }
    out.toByteArray
  }

  private def writeFrame(out: java.io.ByteArrayOutputStream,
      fb: Array[Byte]): Unit = {
    val padded = pad8(fb.length)
    out.write(Array[Byte](-1, -1, -1, -1))
    var k = 0
    while (k < 4) { out.write((padded >> (8 * k)) & 0xff); k += 1 }
    out.write(fb)
    var padCount = padded - fb.length
    while (padCount > 0) { out.write(0); padCount -= 1 }
  }

  /** Encode a stream (schema + batches + EOS). The two lie flags plant
    * the metadata damage classes while leaving every data byte intact. */
  def encode(fields: Seq[AField], batches: Seq[ABatch],
      lieTextNullCount: Boolean = false,
      lieLastOffset: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    writeFrame(out, schemaMessage(fields))
    batches.zipWithIndex.foreach { case (bt, i) =>
      out.write(batchMessage(fields, bt,
        lieTextNullCount = lieTextNullCount && i == 0,
        lieLastOffset = lieLastOffset && i == 0))
    }
    out.write(Array[Byte](-1, -1, -1, -1, 0, 0, 0, 0)) // EOS
    out.toByteArray
  }
}

/** In-plan synthesizer + gate for d139: each doc becomes an Arrow IPC
  * stream of K = 3 + doc_id%5 rows — id BIGINT (never null), val
  * DOUBLE (null when (doc_id+j)%8==0, else ((doc_id+j)%41)*0.25),
  * text UTF8 (null when (doc_id+j)%6==0, else codepoint slice j of
  * the doc text) — shipped in batches of 4 (multi-message streams),
  * decoded back through the strict reader, and aggregated. Damage %7:
  * 0 → truncation (the EOS rule catches a stream that just stops);
  * 3 → a LYING null_count on the text node (bitmap intact — only the
  * recount audit catches it); 5 → a LYING final utf8 offset (one byte
  * past the data buffer — only the offsets-vs-data tiling catches
  * it). Damaged docs contribute nothing (the d111 rule). */
object ArrowIpcSim {
  import ArrowIpc._

  private[graft] val FIELDS = Seq(
    AField("id", nullable = true, AInt64),
    AField("val", nullable = true, AFloat64),
    AField("text", nullable = true, AUtf8))

  private[graft] def k(docId: Long): Int = (3 + docId % 5).toInt

  private[graft] def slices(text: String, k: Int): IndexedSeq[String] = {
    val cps = text.codePointCount(0, text.length)
    (0 until k).map { i =>
      val a = text.offsetByCodePoints(0, (i.toLong * cps / k).toInt)
      val b = text.offsetByCodePoints(0, ((i + 1).toLong * cps / k).toInt)
      text.substring(a, b)
    }
  }

  private[graft] def batchesFor(docId: Long, text: String): Seq[ABatch] = {
    val kk = k(docId)
    val sl = slices(text, kk)
    (0 until kk).grouped(4).map { grp =>
      val n = grp.size
      val idV = new Array[Boolean](n)
      val ids = new Array[Long](n)
      val vV = new Array[Boolean](n)
      val vs = new Array[Double](n)
      val tV = new Array[Boolean](n)
      val ts = new Array[String](n)
      grp.zipWithIndex.foreach { case (j, i) =>
        idV(i) = true
        ids(i) = docId * 100 + j
        if ((docId + j) % 8 != 0) { vV(i) = true; vs(i) = ((docId + j) % 41) * 0.25 }
        if ((docId + j) % 6 != 0) { tV(i) = true; ts(i) = sl(j) }
      }
      ABatch(n, Seq(ACol(idV, ids, null, null), ACol(vV, null, vs, null),
        ACol(tV, null, null, ts)))
    }.toSeq
  }

  private[graft] def streamFor(docId: Long, text: String): Array[Byte] = {
    val mode = docId % 7
    val bytes = encode(FIELDS, batchesFor(docId, text),
      lieTextNullCount = mode == 3, lieLastOffset = mode == 5)
    if (mode == 0) java.util.Arrays.copyOf(bytes, bytes.length - 9)
    else bytes
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_batches", LongType),
    StructField("n_rows", LongType),
    StructField("sum_ids", LongType),
    StructField("sum_vals", DoubleType),
    StructField("n_text_nulls", LongType),
    StructField("text_bytes", LongType)))

  /** The gate: build the stream, decode it back through the strict
    * reader (audits ON), aggregate per doc. */
  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            decode(streamFor(id, text)) match {
              case Some((fields, bs)) if fields == FIELDS =>
                var nRows = 0L
                var sumIds = 0L
                var sumVals = 0.0
                var nTextNulls = 0L
                var textBytes = 0L
                bs.foreach { b =>
                  nRows += b.nRows
                  val Seq(ic, vc, tc) = b.cols
                  var i = 0
                  while (i < b.nRows) {
                    if (ic.valid(i)) sumIds += ic.longs(i)
                    if (vc.valid(i)) sumVals += vc.doubles(i)
                    if (tc.valid(i))
                      textBytes += tc.strs(i).getBytes("UTF-8").length
                    else nTextNulls += 1
                    i += 1
                  }
                }
                Iterator.single(Row(id, bs.size.toLong, nRows, sumIds,
                  sumVals, nTextNulls, textBytes))
              case _ => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
