package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQLite database files, from scratch (the published file format at
  * sqlite.org/fileformat2.html) — the REFERENCE'S OWN OUTPUT FORMAT:
  * slurm2sql's whole purpose is to produce a `.sqlite3` warehouse
  * (slurm2sql.py:21-24, 940-1016), so a migrating user's first corpus
  * is a directory of SQLite files. This walker reads them as a row
  * source with no borrowed primitive (no JDBC, no sqlite3 native lib):
  *
  *  - the 100-byte header (magic, page size incl. the `1` = 65536
  *    encoding, reserved-space arithmetic, the 64/32/32 payload
  *    fractions, text encoding, database page count vs file length);
  *  - sqlite varints (big-endian 7-bit groups, 9th byte carries 8);
  *  - the record format (serial types: NULL / 1-8-byte big-endian
  *    two's-complement ints / IEEE-754 float / the 0,1 constants /
  *    blob / text), with the INTEGER-PRIMARY-KEY rule (the IPK column
  *    is stored NULL, its value IS the rowid);
  *  - table b-trees: interior (0x05) and leaf (0x0d) pages, the cell
  *    pointer array, in-order traversal with strict rowid ascent and
  *    interior-key sandwiching;
  *  - the exact leaf-payload spill formula (X = U-35, M =
  *    (U-12)*32/255 - 23, K = M + (P-M) mod (U-4)) and overflow-page
  *    chains (4-byte next + data, last `next` must be 0);
  *  - the sqlite_schema table on page 1 (type/name/tbl_name/rootpage/
  *    sql), which is how a table name resolves to a root page.
  *
  * STRICT: a lying page count, a bad magic/fraction/encoding, a cell
  * pointer outside the content area, a non-tiling record (header or
  * values not landing exactly on their declared boundaries), reserved
  * serial types 10/11, an out-of-range or revisited page (cycle), a
  * broken overflow chain (wrong length, nonzero final `next`), or a
  * rowid-order violation all QUARANTINE the file. Text bytes decode
  * through d128's strict UTF-8 tables — undecodable text quarantines.
  *
  * The writer emits the same subset (schema page, greedy-packed
  * leaves under an interior root, spilled overflow chains) and is
  * interop-pinned BOTH directions against the sqlite3 CLI: our files
  * pass `PRAGMA integrity_check` and SELECT back row-identical, and
  * CLI-written multi-leaf/overflow databases walk through this
  * decoder byte-exactly (SqlitePagesSpec).
  */
object SqliteCodec {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ---------------------------------------------------------------- values

  sealed trait SVal
  case object SNull extends SVal
  final case class SInt(v: Long) extends SVal
  final case class SReal(v: Double) extends SVal
  final case class SText(v: String) extends SVal
  final case class SBlob(v: Array[Byte]) extends SVal

  final case class STable(name: String, sql: String,
      rows: Seq[(Long, Seq[SVal])])

  // --------------------------------------------------------------- varints

  /** sqlite varint: big-endian base-128, bytes 1..8 carry 7 bits each
    * (high bit = continue), a 9th byte carries a full 8. */
  private[graft] def readVarint(b: Array[Byte], at: Int, end: Int): (Long, Int) = {
    var v = 0L
    var n = 0
    while (n < 8) {
      if (at + n >= end) throw Malformed
      val x = b(at + n)
      v = (v << 7) | (x & 0x7f)
      n += 1
      if ((x & 0x80) == 0) return (v, n)
    }
    if (at + 8 >= end) throw Malformed
    ((v << 8) | (b(at + 8) & 0xff), 9)
  }

  private[graft] def writeVarint(v: Long): Array[Byte] = {
    if (v < 0 || (v >>> 56) != 0) {
      // 9-byte form: 8 continuation bytes of 7 bits + a final 8
      val out = new Array[Byte](9)
      out(8) = (v & 0xff).toByte
      var x = v >>> 8
      var i = 7
      while (i >= 0) { out(i) = ((x & 0x7f) | 0x80).toByte; x >>>= 7; i -= 1 }
      out
    } else {
      var n = 1
      while ((v >>> (7 * n)) != 0) n += 1
      val out = new Array[Byte](n)
      var i = n - 1
      var x = v
      while (i >= 0) {
        out(i) = ((x & 0x7f) | (if (i == n - 1) 0 else 0x80)).toByte
        x >>>= 7
        i -= 1
      }
      out
    }
  }

  // --------------------------------------------------------------- records

  /** Serialize one record (the on-disk row format). `typeLieOnText`
    * is the %7==5 damage hook: the LAST text column's serial type is
    * declared as the same-length BLOB (N-1) — every byte and every
    * length still tiles; only the schema's type discipline catches it. */
  private[graft] def encodeRecord(vals: Seq[SVal],
      typeLieOnText: Boolean = false): Array[Byte] = {
    def intSerial(v: Long): (Long, Array[Byte]) = {
      if (v == 0) (8L, Array.empty)
      else if (v == 1) (9L, Array.empty)
      else {
        val n =
          if (v >= -128 && v < 128) 1
          else if (v >= -32768 && v < 32768) 2
          else if (v >= -8388608 && v < 8388608) 3
          else if (v >= -2147483648L && v < 2147483648L) 4
          else if (v >= -140737488355328L && v < 140737488355328L) 6
          else 8
        val serial = n match {
          case 1 => 1L; case 2 => 2L; case 3 => 3L; case 4 => 4L
          case 6 => 5L; case 8 => 6L
        }
        val b = new Array[Byte](n)
        var i = 0
        while (i < n) { b(i) = (v >>> (8 * (n - 1 - i))).toByte; i += 1 }
        (serial, b)
      }
    }
    val lastTextIdx = vals.lastIndexWhere(_.isInstanceOf[SText])
    val parts = vals.zipWithIndex.map {
      case (SNull, _) => (0L, Array.empty[Byte])
      case (SInt(v), _) => intSerial(v)
      case (SReal(d), _) =>
        val bits = java.lang.Double.doubleToLongBits(d)
        val b = new Array[Byte](8)
        var i = 0
        while (i < 8) { b(i) = (bits >>> (8 * (7 - i))).toByte; i += 1 }
        (7L, b)
      case (SText(s), i) =>
        val b = s.getBytes("UTF-8")
        val n = 13L + 2L * b.length
        (if (typeLieOnText && i == lastTextIdx) n - 1 else n, b)
      case (SBlob(b), _) => (12L + 2L * b.length, b)
    }
    val typeBytes = parts.flatMap(p => writeVarint(p._1)).toArray
    // header length includes its own varint; sizes here keep it 1 byte
    val hdrLen = typeBytes.length + 1
    require(hdrLen < 128, "record header too large for the gate scope")
    val buf = new java.io.ByteArrayOutputStream(hdrLen + 64)
    buf.write(hdrLen)
    buf.write(typeBytes)
    parts.foreach(p => buf.write(p._2))
    buf.toByteArray
  }

  // ---------------------------------------------------------------- writer

  private def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  final case class Layout(bytes: Array[Byte], firstLeafPage: Map[String, Int])

  /** Write a database: page 1 = sqlite_schema leaf, each table a
    * greedy-packed leaf run (≤ `maxRowsPerLeaf` cells, and never past
    * the page's content capacity) under an interior root when more
    * than one leaf, overflow chains appended after all b-tree pages.
    * The layout is deterministic; `typeLie` plants the %7==5 record
    * damage on one (table, rowIndex). */
  def write(tables: Seq[STable], pageSize: Int = 512,
      maxRowsPerLeaf: Int = 2,
      typeLie: Option[(String, Int)] = None): Layout = {
    val U = pageSize // reserved = 0
    val X = U - 35
    val M = (U - 12) * 32 / 255 - 23

    // record bytes per row, with the damage hook applied
    val recs: Seq[(String, Seq[(Long, Array[Byte])])] = tables.map { t =>
      t.name -> t.rows.zipWithIndex.map { case ((rowid, vals), i) =>
        val lie = typeLie.exists(d => d._1 == t.name && d._2 == i)
        (rowid, encodeRecord(vals, typeLieOnText = lie))
      }
    }

    // leaf-cell byte size (inline part) for a record of payload P
    def inlineLen(p: Int): Int =
      if (p <= X) p
      else { val k = M + (p - M) % (U - 4); if (k <= X) k else M }
    def cellBytes(rowid: Long, p: Int): Int = {
      val inl = inlineLen(p)
      writeVarint(p.toLong).length + writeVarint(rowid).length + inl +
        (if (inl < p) 4 else 0)
    }

    // greedy leaf packing: capacity = U - 8 (leaf header), 2 bytes of
    // pointer per cell, cap at maxRowsPerLeaf
    def packLeaves(rows: Seq[(Long, Array[Byte])]): Seq[Seq[(Long, Array[Byte])]] = {
      val leaves = Seq.newBuilder[Seq[(Long, Array[Byte])]]
      var cur = Vector.empty[(Long, Array[Byte])]
      var used = 0
      rows.foreach { case (rowid, rec) =>
        val cb = cellBytes(rowid, rec.length) + 2
        if (cur.nonEmpty && (cur.size >= maxRowsPerLeaf || used + cb > U - 8)) {
          leaves += cur; cur = Vector.empty; used = 0
        }
        require(cb <= U - 8, "single cell exceeds page capacity")
        cur = cur :+ (rowid, rec); used += cb
      }
      if (cur.nonEmpty) leaves += cur
      leaves.result()
    }

    // ---- allocation plan: page numbers for roots, leaves, overflow
    val packed = recs.map { case (n, rows) => n -> packLeaves(rows) }
    var next = 2
    val plan = packed.map { case (name, leaves) =>
      if (leaves.size == 1) { val root = next; next += 1; (name, root, Seq(root), leaves) }
      else {
        val root = next
        val leafPages = (next + 1) to (next + leaves.size)
        next += 1 + leaves.size
        (name, root, leafPages.toSeq, leaves)
      }
    }
    // overflow chains in (table, row) order
    val overflowStart = next
    var ovNext = overflowStart
    val ovAssign = scala.collection.mutable.Map[(String, Long), Seq[Int]]()
    plan.foreach { case (name, _, _, leaves) =>
      leaves.flatten.foreach { case (rowid, rec) =>
        val spill = rec.length - inlineLen(rec.length)
        if (spill > 0) {
          val n = (spill + (U - 4) - 1) / (U - 4)
          ovAssign((name, rowid)) = (ovNext until ovNext + n).toSeq
          ovNext += n
        }
      }
    }
    val nPages = ovNext - 1
    val db = new Array[Byte](nPages * pageSize)
    def put(off: Int, b: Array[Byte]): Unit = System.arraycopy(b, 0, db, off, b.length)

    // ---- page writers
    /** Lay a leaf table page: cells packed downward from U. */
    def writeLeaf(page: Int, hdrAt: Int, cells: Seq[(Long, Array[Byte], Seq[Int])]): Unit = {
      val base = (page - 1) * pageSize
      var top = U
      val offs = cells.map { case (rowid, rec, ovPages) =>
        val inl = inlineLen(rec.length)
        val body = new java.io.ByteArrayOutputStream()
        body.write(writeVarint(rec.length.toLong))
        body.write(writeVarint(rowid))
        body.write(rec, 0, inl)
        if (inl < rec.length) body.write(be32(ovPages.head.toLong))
        val cb = body.toByteArray
        top -= cb.length
        put(base + top, cb)
        top
      }
      val h = base + hdrAt
      db(h) = 0x0d
      put(h + 1, be16(0))
      put(h + 3, be16(cells.size))
      put(h + 5, be16(if (top == 65536) 0 else top))
      db(h + 7) = 0
      offs.zipWithIndex.foreach { case (o, i) => put(h + 8 + 2 * i, be16(o)) }
    }
    def writeInterior(page: Int, children: Seq[(Int, Long)], rightmost: Int): Unit = {
      val base = (page - 1) * pageSize
      var top = U
      val offs = children.map { case (child, key) =>
        val body = be32(child.toLong) ++ writeVarint(key)
        top -= body.length
        put(base + top, body)
        top
      }
      db(base) = 0x05
      put(base + 1, be16(0))
      put(base + 3, be16(children.size))
      put(base + 5, be16(if (top == 65536) 0 else top))
      db(base + 7) = 0
      put(base + 8, be32(rightmost.toLong))
      offs.zipWithIndex.foreach { case (o, i) => put(base + 12 + 2 * i, be16(o)) }
    }

    // ---- schema page (page 1)
    val schemaRows: Seq[(Long, Array[Byte])] = plan.zipWithIndex.map {
      case ((name, root, _, _), i) =>
        val sql = tables.find(_.name == name).get.sql
        (i + 1L, encodeRecord(Seq(
          SText("table"), SText(name), SText(name), SInt(root.toLong), SText(sql))))
    }
    // page 1's btree header sits after the 100-byte file header
    locally {
      val cells = schemaRows.map { case (rid, rec) =>
        require(rec.length <= X, "schema record spill unsupported in scope")
        (rid, rec, Seq.empty[Int])
      }
      // reuse writeLeaf but with header at offset 100
      val base = 0
      var top = U
      val offs: Seq[Int] = cells.map { case (rowid, rec, _) =>
        val body = new java.io.ByteArrayOutputStream()
        body.write(writeVarint(rec.length.toLong))
        body.write(writeVarint(rowid))
        body.write(rec, 0, rec.length)
        val cb = body.toByteArray
        top -= cb.length
        put(base + top, cb)
        top
      }
      val h = 100
      db(h) = 0x0d
      put(h + 1, be16(0))
      put(h + 3, be16(cells.size))
      put(h + 5, be16(top))
      db(h + 7) = 0
      var oi = 0
      while (oi < offs.length) {
        put(h + 8 + 2 * oi, be16(offs(oi)))
        oi += 1
      }
    }

    // ---- table pages + overflow
    plan.foreach { case (name, root, leafPages, leaves) =>
      if (leaves.size > 1) {
        val keyed = leafPages.zip(leaves.map(_.last._1))
        writeInterior(root, keyed.init, leafPages.last)
      }
      leafPages.zip(leaves).foreach { case (pg, cells) =>
        writeLeaf(pg, 0, cells.map { case (rowid, rec) =>
          (rowid, rec, ovAssign.getOrElse((name, rowid), Seq.empty))
        })
      }
      leaves.flatten.foreach { case (rowid, rec) =>
        val inl = inlineLen(rec.length)
        if (inl < rec.length) {
          val pages = ovAssign((name, rowid))
          var at = inl
          pages.zipWithIndex.foreach { case (pg, i) =>
            val base = (pg - 1) * pageSize
            val nextPg = if (i == pages.size - 1) 0 else pages(i + 1)
            put(base, be32(nextPg.toLong))
            val n = math.min(U - 4, rec.length - at)
            System.arraycopy(rec, at, db, base + 4, n)
            at += n
          }
        }
      }
    }

    // ---- 100-byte file header
    put(0, "SQLite format 3\u0000".getBytes("ISO-8859-1"))
    put(16, be16(pageSize))
    db(18) = 1; db(19) = 1 // legacy journal read/write versions
    db(20) = 0 // reserved bytes per page
    db(21) = 64; db(22) = 32; db(23) = 32 // payload fractions
    put(24, be32(1)) // change counter
    put(28, be32(nPages.toLong))
    put(32, be32(0)); put(36, be32(0)) // freelist
    put(40, be32(1)) // schema cookie
    put(44, be32(4)) // schema format
    put(48, be32(0)) // default cache size
    put(52, be32(0)) // largest root (no autovacuum)
    put(56, be32(1)) // text encoding: UTF-8
    put(92, be32(1)) // version-valid-for = change counter
    put(96, be32(3051002L)) // library version stamp
    val firstLeaf = plan.map { case (name, _, leafPages, _) => name -> leafPages.head }
    Layout(db, firstLeaf.toMap)
  }

  // ---------------------------------------------------------------- walker

  private def u16(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)
  private def u32(b: Array[Byte], at: Int): Long =
    ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
      ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)

  /** Parse one record → column values (null / Long / Double / String /
    * Array[Byte]); header and values must tile EXACTLY. */
  private[graft] def parseRecord(rec: Array[Byte]): IndexedSeq[Any] = {
    val (hdrLen, n0) = readVarint(rec, 0, rec.length)
    if (hdrLen < n0 || hdrLen > rec.length) throw Malformed
    var at = n0
    val types = Vector.newBuilder[Long]
    while (at < hdrLen) {
      val (t, n) = readVarint(rec, at, hdrLen.toInt)
      if (t == 10 || t == 11 || t < 0) throw Malformed
      types += t
      at += n
    }
    if (at != hdrLen) throw Malformed
    var v = hdrLen.toInt
    val out = types.result().map { t =>
      def takeInt(n: Int): Long = {
        if (v + n > rec.length) throw Malformed
        var x = if (n > 0 && rec(v) < 0) -1L else 0L
        var i = 0
        while (i < n) { x = (x << 8) | (rec(v + i) & 0xff); i += 1 }
        v += n
        x
      }
      t match {
        case 0 => null
        case 1 => java.lang.Long.valueOf(takeInt(1))
        case 2 => java.lang.Long.valueOf(takeInt(2))
        case 3 => java.lang.Long.valueOf(takeInt(3))
        case 4 => java.lang.Long.valueOf(takeInt(4))
        case 5 => java.lang.Long.valueOf(takeInt(6))
        case 6 => java.lang.Long.valueOf(takeInt(8))
        case 7 =>
          java.lang.Double.valueOf(
            java.lang.Double.longBitsToDouble(takeInt(8)))
        case 8 => java.lang.Long.valueOf(0L)
        case 9 => java.lang.Long.valueOf(1L)
        case n if n >= 12 && n % 2 == 0 =>
          val len = ((n - 12) / 2).toInt
          if (v + len > rec.length) throw Malformed
          val b = java.util.Arrays.copyOfRange(rec, v, v + len)
          v += len
          b
        case n if n >= 13 =>
          val len = ((n - 13) / 2).toInt
          if (v + len > rec.length) throw Malformed
          val s =
            try CharsetSniff.decodeUtf8(rec, v, v + len)
            catch { case _: Throwable => throw Malformed }
          v += len
          s
        case _ => throw Malformed
      }
    }
    if (v != rec.length) throw Malformed // slack bytes after the values
    out
  }

  private final class Db(val bytes: Array[Byte]) {
    if (bytes.length < 512) throw Malformed
    if (!(0 until 16).forall(i =>
      bytes(i) == "SQLite format 3\u0000".charAt(i).toByte)) throw Malformed
    val pageSizeRaw: Int = u16(bytes, 16)
    val pageSize: Int =
      if (pageSizeRaw == 1) 65536
      else if (pageSizeRaw >= 512 && (pageSizeRaw & (pageSizeRaw - 1)) == 0)
        pageSizeRaw
      else throw Malformed
    val reserved: Int = bytes(20) & 0xff
    val usable: Int = pageSize - reserved
    if (usable < 480) throw Malformed
    if ((bytes(21) & 0xff) != 64 || (bytes(22) & 0xff) != 32 ||
        (bytes(23) & 0xff) != 32) throw Malformed
    val nPages: Long = u32(bytes, 28)
    if (nPages < 1 || nPages * pageSize != bytes.length) throw Malformed
    if (u32(bytes, 44) < 1 || u32(bytes, 44) > 4) throw Malformed // schema fmt
    if (u32(bytes, 56) != 1) throw Malformed // UTF-8 only in scope
    val visited = scala.collection.mutable.Set[Long]()

    def pageBase(p: Long): Int = {
      if (p < 1 || p > nPages) throw Malformed
      ((p - 1) * pageSize).toInt
    }
    def visit(p: Long): Unit =
      if (!visited.add(p)) throw Malformed // cycle / shared page

    /** Read an overflow chain: exactly `need` bytes. */
    def overflow(first: Long, need: Int): Array[Byte] = {
      val out = new Array[Byte](need)
      var at = 0
      var pg = first
      while (at < need) {
        if (pg == 0) throw Malformed
        visit(pg)
        val base = pageBase(pg)
        val next = u32(bytes, base)
        val n = math.min(usable - 4, need - at)
        System.arraycopy(bytes, base + 4, out, at, n)
        at += n
        pg = next
      }
      if (pg != 0) throw Malformed // chain longer than the payload needs
      out
    }

    /** In-order walk of a table b-tree; returns (rowid, record) pairs
      * and enforces ascent + interior-key sandwiching. */
    def walkTable(root: Long): Seq[(Long, IndexedSeq[Any])] = {
      val out = Seq.newBuilder[(Long, IndexedSeq[Any])]
      var last = Long.MinValue
      val X = usable - 35
      val M = (usable - 12) * 32 / 255 - 23
      def page(p: Long, depth: Int): Unit = {
        if (depth > 32) throw Malformed
        visit(p)
        val base = pageBase(p)
        val hdr = base + (if (p == 1) 100 else 0)
        val flag = bytes(hdr) & 0xff
        val isLeaf = flag == 0x0d
        if (!isLeaf && flag != 0x05) throw Malformed
        val cc = u16(bytes, hdr + 3)
        val hdrSize = if (isLeaf) 8 else 12
        val arrayEnd = hdr + hdrSize + 2 * cc
        if (arrayEnd > base + usable) throw Malformed
        val rawStart = u16(bytes, hdr + 5)
        val contentStart = if (rawStart == 0) 65536 else rawStart
        if (contentStart > usable || base + contentStart < arrayEnd)
          throw Malformed
        def cellOff(i: Int): Int = {
          val o = u16(bytes, hdr + hdrSize + 2 * i)
          if (o < contentStart || o >= usable) throw Malformed
          base + o
        }
        if (isLeaf) {
          var i = 0
          while (i < cc) {
            var at = cellOff(i)
            val lim = base + usable
            val (p0, n0) = readVarint(bytes, at, lim); at += n0
            if (p0 < 0 || p0 > Int.MaxValue) throw Malformed
            val payload = p0.toInt
            val (rowid, n1) = readVarint(bytes, at, lim); at += n1
            if (rowid <= last) throw Malformed
            last = rowid
            val inline =
              if (payload <= X) payload
              else {
                val k = M + (payload - M) % (usable - 4)
                if (k <= X) k else M
              }
            if (at + inline > lim) throw Malformed
            val rec =
              if (inline == payload)
                java.util.Arrays.copyOfRange(bytes, at, at + inline)
              else {
                if (at + inline + 4 > lim) throw Malformed
                val first = u32(bytes, at + inline)
                val tail = overflow(first, payload - inline)
                val full = new Array[Byte](payload)
                System.arraycopy(bytes, at, full, 0, inline)
                System.arraycopy(tail, 0, full, inline, tail.length)
                full
              }
            out += ((rowid, parseRecord(rec)))
            i += 1
          }
        } else {
          var i = 0
          while (i < cc) {
            val at = cellOff(i)
            if (at + 4 > base + usable) throw Malformed
            val child = u32(bytes, at)
            val (key, _) = readVarint(bytes, at + 4, base + usable)
            page(child, depth + 1)
            if (last > key) throw Malformed // left subtree exceeds its key
            i += 1
          }
          page(u32(bytes, hdr + 8), depth + 1)
        }
      }
      page(root, 0)
      out.result()
    }
  }

  /** Read every row of `table` (resolved through sqlite_schema),
    * strictly; throws Malformed on any format violation. */
  def readTable(dbBytes: Array[Byte], table: String): Seq[(Long, IndexedSeq[Any])] = {
    val db = new Db(dbBytes)
    val schema = db.walkTable(1L)
    val entries = schema.map { case (_, cols) =>
      if (cols.length != 5) throw Malformed
      (cols(0), cols(1), cols(3)) match {
        case (t: String, n: String, r: java.lang.Long) => (t, n, r.longValue())
        case _ => throw Malformed
      }
    }
    val tables = entries.filter(_._1 == "table")
    if (tables.map(_._2).distinct.length != tables.length) throw Malformed
    val root = tables.find(_._2 == table).getOrElse(throw Malformed)._3
    if (root < 2 || root > db.nPages) throw Malformed
    db.walkTable(root)
  }

  /** Table names present (for the schema-selection tests). */
  def tableNames(dbBytes: Array[Byte]): Seq[String] = {
    val db = new Db(dbBytes)
    db.walkTable(1L).flatMap { case (_, cols) =>
      (cols(0), cols(1)) match {
        case (t: String, n: String) if t == "table" => Some(n)
        case _ => None
      }
    }
  }
}

/** In-plan synthesizer + gate for d132 — the SQLite warehouse file as
  * a ROW SOURCE (the d111 discipline): each doc becomes a `.sqlite3`
  * database (512-byte pages — the format minimum, so interior pages
  * and overflow chains run corpus-wide) holding a `docs` table of K
  * rows (K = 4 + doc_id%5): rowid/id = the IPK (stored NULL — the
  * rule), val/flag ints (flag 0/1 exercises serial types 8/9), score
  * a REAL, body = the codepoint slice + a 600-byte pad so EVERY row
  * spills into an overflow chain. A decoy `meta` table makes schema
  * selection real. Damaged docs contribute nothing.
  *
  * Damage slice on doc_id%7: 0 → the file truncated 40 bytes (the
  * header's page count now lies); 3 → a cell pointer stomped into the
  * page-header region (every byte of every record intact — only the
  * strict content-area bound catches it); 5 → the body column's
  * serial type declared as the same-length BLOB (lengths all tile —
  * only the schema's type discipline catches it). */
object SqliteSim {

  private[graft] def kRows(docId: Long): Int = (4 + docId % 5).toInt

  private[graft] val PAD: String = "x" * 600

  private[graft] def slices(docId: Long, text: String): Seq[String] = {
    val k = kRows(docId)
    val cps = text.codePointCount(0, text.length)
    (0 until k).map { i =>
      val a = text.offsetByCodePoints(0, (i.toLong * cps / k).toInt)
      val b = text.offsetByCodePoints(0, ((i + 1).toLong * cps / k).toInt)
      text.substring(a, b)
    }
  }

  private[graft] def docsTable(docId: Long, text: String): SqliteCodec.STable = {
    import SqliteCodec._
    STable("docs",
      "CREATE TABLE docs(id INTEGER PRIMARY KEY, val INTEGER, flag INTEGER, score REAL, body TEXT)",
      slices(docId, text).zipWithIndex.map { case (sl, j) =>
        (docId * 8 + j, Seq(SNull, SInt((docId * 7 + j * 13) % 1000),
          SInt(j % 2), SReal(j + 0.5), SText(sl + PAD)))
      })
  }

  private[graft] def metaTable(docId: Long): SqliteCodec.STable = {
    import SqliteCodec._
    STable("meta", "CREATE TABLE meta(k INTEGER PRIMARY KEY, note TEXT)",
      Seq((docId, Seq(SNull, SText("decoy")))))
  }

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    import SqliteCodec._
    (docId % 7) match {
      case 0 =>
        val clean = write(Seq(docsTable(docId, text), metaTable(docId))).bytes
        java.util.Arrays.copyOf(clean, clean.length - 40)
      case 3 =>
        val lay = write(Seq(docsTable(docId, text), metaTable(docId)))
        val leafBase = (lay.firstLeafPage("docs") - 1) * 512
        // first cell pointer → 7: inside the page header, before any
        // legal content area
        lay.bytes(leafBase + 8) = 0
        lay.bytes(leafBase + 9) = 7
        lay.bytes
      case 5 =>
        write(Seq(docsTable(docId, text), metaTable(docId)),
          typeLie = Some(("docs", 0))).bytes
      case _ =>
        write(Seq(docsTable(docId, text), metaTable(docId))).bytes
    }
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("row_idx", IntegerType),
    StructField("id", LongType),
    StructField("val", LongType),
    StructField("flag", LongType),
    StructField("score", DoubleType),
    StructField("body", StringType)))

  /** The database file as a row source: strict walk of the `docs`
    * table (schema-resolved past the decoy), typed per the declared
    * schema (IPK NULL → id = rowid; ints; a REAL; TEXT body — a blob
    * where text belongs quarantines). Damaged files contribute
    * nothing (the d105/d111 row-source rule). */
  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            val parsed =
              try {
                val rows = SqliteCodec.readTable(payloadFor(id, text), "docs")
                Some(rows.map { case (rowid, cols) =>
                  if (cols.length != 5) throw SqliteCodec.Malformed
                  val v = cols(1) match {
                    case x: java.lang.Long => x.longValue()
                    case _ => throw SqliteCodec.Malformed
                  }
                  val f = cols(2) match {
                    case x: java.lang.Long => x.longValue()
                    case _ => throw SqliteCodec.Malformed
                  }
                  val sc = cols(3) match {
                    case x: java.lang.Double => x.doubleValue()
                    case x: java.lang.Long => x.toDouble
                    case _ => throw SqliteCodec.Malformed
                  }
                  val body = cols(4) match {
                    case s: String => s
                    case _ => throw SqliteCodec.Malformed
                  }
                  if (cols(0) != null) throw SqliteCodec.Malformed // IPK rule
                  (rowid, v, f, sc, body)
                })
              } catch { case _: Throwable => None }
            parsed.toSeq.flatten.zipWithIndex.map { case ((rowid, v, f, sc, body), j) =>
              Row(id, j, rowid, v, f, sc, body)
            }
          }
        }
      }(enc)
  }
}
