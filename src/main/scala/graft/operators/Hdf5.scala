package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** d172 — HDF5, the classic scientific/ML dataset container (many
  * public speech/vision corpora ship `.h5`), implemented BOTH
  * directions from the published HDF5 File Format Specification
  * (versions 0 and 2 of the superblock; object header versions 1 and
  * 2; the v1 chunk B-tree; the deflate filter pipeline riding OUR
  * d124 inflate/deflate).
  *
  * Scope (bounded, stated — the walker refuses, never guesses):
  *  - superblock v0 (classic: root group via SYMBOL TABLE — v1 group
  *    B-tree + local heap + SNOD nodes) and v2 (root object header
  *    direct, Jenkins lookup3 checksummed);
  *  - object header v1 (8-byte-aligned messages, single block — a
  *    continuation message quarantines) and v2 ("OHDR", checksummed);
  *  - datatypes: fixed-point int64 LE signed and IEEE float32 LE,
  *    with the datatype message's bit fields VALIDATED (a float32
  *    claiming an 11-bit exponent is a lie, not a dialect);
  *  - dataspace v1/v2, rank 1 or 2;
  *  - data layout v3: contiguous (declared size AUDITED against
  *    dataspace x element size) and chunked through the v1 B-tree
  *    (level 0; keys must be ordered, chunks must TILE the dataspace
  *    exactly, per-chunk filtered sizes audited);
  *  - filter pipeline: deflate (id 1) only.
  *
  * Self-pinned honestly: no independent HDF5 implementation exists
  * on this host (no h5py, no h5dump, no jarhdf5) — the d147/d167
  * precedent: the spec structures are real, the damage grid proves
  * the audits bite, and the gate oracle replays the closed form.
  *
  * Audits (the lying-field classes a 100 TB ingest must catch):
  *  - the superblock's END-OF-FILE ADDRESS vs the actual byte count
  *    (THE hdf5 truncation tell — the format has no trailer);
  *  - v2 superblock + OHDR checksums (lookup3, verified bit-exact);
  *  - contiguous layout's declared size vs dataspace x elsize;
  *  - chunk B-tree key ORDER, chunk TILING, filter-mask zero, and
  *    each chunk's decompressed size vs the chunk's element count;
  *  - every address in bounds; object-header gaps refused.
  */
object Hdf5 {

  private[graft] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ------------------------------------------------------------ lookup3
  /** Bob Jenkins' lookup3 `hashlittle` (the HDF5 metadata checksum),
    * from the public-domain reference (lookup3.c, May 2006). */
  private[graft] def lookup3(data: Array[Byte], from: Int, len0: Int,
                                 init: Int): Int = {
    var len = len0
    var p = from
    var a = 0xdeadbeef + len0 + init
    var b = a
    var c = a
    def u32(o: Int): Int =
      (data(o) & 0xFF) | ((data(o + 1) & 0xFF) << 8) |
        ((data(o + 2) & 0xFF) << 16) | ((data(o + 3) & 0xFF) << 24)
    def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))
    while (len > 12) {
      a += u32(p); b += u32(p + 4); c += u32(p + 8)
      // mix
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      p += 12; len -= 12
    }
    // last block: affect registers per remaining length (fallthrough)
    def byte(o: Int): Int = data(p + o) & 0xFF
    if (len > 0) {
      if (len >= 11) c += byte(10) << 16
      if (len >= 10) c += byte(9) << 8
      if (len >= 9) c += byte(8)
      if (len >= 8) b += byte(7) << 24
      if (len >= 7) b += byte(6) << 16
      if (len >= 6) b += byte(5) << 8
      if (len >= 5) b += byte(4)
      if (len >= 4) a += byte(3) << 24
      if (len >= 3) a += byte(2) << 16
      if (len >= 2) a += byte(1) << 8
      if (len >= 1) a += byte(0)
      // final
      c ^= b; c -= rot(b, 14)
      a ^= c; a -= rot(c, 11)
      b ^= a; b -= rot(a, 25)
      c ^= b; c -= rot(b, 16)
      a ^= c; a -= rot(c, 4)
      b ^= a; b -= rot(a, 14)
      c ^= b; c -= rot(b, 24)
    }
    c
  }

  // ------------------------------------------------------------ model
  /** One dataset: 1-D int64 or (rank-2) float32 values. */
  private[graft] sealed trait Ds { def name: String }
  private[graft] final case class DsI64(name: String,
                                            vals: Array[Long]) extends Ds
  private[graft] final case class DsF32(name: String, rows: Int,
                                            cols: Int, vals: Array[Float],
                                            chunkRows: Int,
                                            deflate: Boolean) extends Ds

  private[graft] final case class H5Info(
      superVersion: Int, nDatasets: Int, sumIds: Long, nIds: Long,
      nFeats: Long, sumFeats: Double)

  // ------------------------------------------------------------ writer
  private final class Out {
    val buf = new java.io.ByteArrayOutputStream(4096)
    def size: Int = buf.size()
    def u8(v: Int): Unit = buf.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32(v: Long): Unit = { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt) }
    def u64(v: Long): Unit = { u32(v & 0xFFFFFFFFL); u32((v >>> 32) & 0xFFFFFFFFL) }
    def bytes(b: Array[Byte]): Unit = buf.write(b, 0, b.length)
    def pad(n: Int): Unit = (0 until n).foreach(_ => u8(0))
  }

  private val SIG = Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
    .map(_.toByte)

  private def le64(v: Long): Array[Byte] = {
    val a = new Array[Byte](8)
    var i = 0
    while (i < 8) { a(i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 }
    a
  }
  private def f32le(v: Float): Array[Byte] = {
    val bits = java.lang.Float.floatToIntBits(v)
    Array((bits & 0xFF).toByte, ((bits >> 8) & 0xFF).toByte,
      ((bits >> 16) & 0xFF).toByte, ((bits >> 24) & 0xFF).toByte)
  }

  /** Datatype message body: class 0 fixed-point i64 LE signed, or
    * class 1 IEEE float32 LE (the standard bit-field layout). */
  private def dtypeI64(o: Out): Unit = {
    o.u8(0x10) // version 1 << 4 | class 0
    o.u8(0x08) // bit field 0: LE, no pad, signed (bit3)
    o.u8(0); o.u8(0)
    o.u32(8) // size
    o.u16(0); o.u16(64) // bit offset / precision
  }
  private def dtypeF32(o: Out): Unit = {
    o.u8(0x11) // version 1 << 4 | class 1 (float)
    o.u8(0x20) // LE, sign location in bits 8-15 of field... bit field 0: mantissa norm (bit4-5=2) + sign loc
    o.u8(31) // sign position byte (bit field 8-15): 31
    o.u8(0)
    o.u32(4) // size
    o.u16(0); o.u16(32) // bit offset / precision
    o.u8(23) // exponent location
    o.u8(8) // exponent size
    o.u8(0) // mantissa location
    o.u8(23) // mantissa size
    o.u32(127) // exponent bias
  }

  private def dspace(o: Out, v2: Boolean, dims: Seq[Long]): Unit =
    if (v2) {
      o.u8(2); o.u8(dims.length); o.u8(0); o.u8(1) // version, rank, flags, type=simple
      dims.foreach(o.u64)
    } else {
      o.u8(1); o.u8(dims.length); o.u8(0) // version, rank, flags (no maxdims)
      o.u8(0); o.u32(0) // reserved (5 bytes)
      dims.foreach(o.u64)
    }

  /** Serialize a message body built by `f`. */
  private def body(f: Out => Unit): Array[Byte] = {
    val o = new Out; f(o); o.buf.toByteArray
  }

  /** v1 object header: version, nmsgs, refcount, header size, then
    * 8-aligned (type u16, size u16, flags u8, pad3, body) messages. */
  private def objHeaderV1(msgs: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val o = new Out
    val padded = msgs.map { case (t, b) =>
      val pad = (8 - (b.length % 8)) % 8
      (t, b ++ Array.fill(pad)(0.toByte))
    }
    val total = padded.map(_._2.length + 8).sum
    o.u8(1); o.u8(0) // version, reserved
    o.u16(msgs.length)
    o.u32(1) // reference count
    o.u32(total) // header size
    o.u32(0) // pad to 8-align the first message (spec: 4-byte gap)
    padded.foreach { case (t, b) =>
      o.u16(t); o.u16(b.length); o.u8(0); o.u8(0); o.u8(0); o.u8(0)
      o.bytes(b)
    }
    o.buf.toByteArray
  }

  /** v2 object header: "OHDR", version 2, flags (u8 size-of-chunk0),
    * messages (type u8, size u16, flags u8), lookup3 checksum. */
  private def objHeaderV2(msgs: Seq[(Int, Array[Byte])]): Array[Byte] = {
    val inner = new Out
    msgs.foreach { case (t, b) =>
      inner.u8(t); inner.u16(b.length); inner.u8(0)
      inner.bytes(b)
    }
    val mb = inner.buf.toByteArray
    val o = new Out
    o.bytes("OHDR".getBytes("US-ASCII"))
    o.u8(2)
    o.u8(0x02) // flags: size-of-chunk0 = 2 bytes
    o.u16(mb.length)
    o.bytes(mb)
    val all = o.buf.toByteArray
    val ck = lookup3(all, 0, all.length, 0)
    val out = new Out
    out.bytes(all); out.u32(ck.toLong & 0xFFFFFFFFL)
    out.buf.toByteArray
  }

  /** Build one file. Layout strategy: fixed-size metadata first (so
    * addresses are computable in one pass), raw data after.
    * `lieEof` writes end-of-file address 8 high; `lieSpace` inflates
    * the ids dataspace by one element; `lieChunk` swaps the two
    * chunk keys' offsets (ordering lie) in the feats B-tree. */
  private[graft] def write(dss: Seq[Ds], v2: Boolean,
                               lieEof: Boolean = false,
                               lieSpace: Boolean = false,
                               lieChunk: Boolean = false): Array[Byte] = {
    // ---- plan: serialize dataset object headers with data addresses
    // resolved via a two-pass layout (headers sized first, data after)
    // pass 1: build with zero addresses to learn sizes
    def buildDs(d: Ds, dataAddrs: Seq[Long], btreeAddr: Long): (Array[Byte], Seq[Array[Byte]]) =
      d match {
        case DsI64(_, vals) =>
          val raw = {
            val o = new Out; vals.foreach(o.u64); o.buf.toByteArray
          }
          val dims = Seq(vals.length.toLong +
            (if (lieSpace) 1L else 0L))
          val msgs = Seq(
            0x0001 -> body(o => dspace(o, v2, dims)),
            0x0003 -> body(dtypeI64),
            0x0008 -> body { o => // layout v3 contiguous
              o.u8(3); o.u8(1)
              o.u64(dataAddrs.head)
              o.u64(raw.length.toLong)
            })
          (if (v2) objHeaderV2(msgs) else objHeaderV1(msgs), Seq(raw))
        case DsF32(_, rows, cols, vals, chunkRows, defl) =>
          val chunks = (0 until rows by chunkRows).map { r0 =>
            val r1 = math.min(r0 + chunkRows, rows)
            val o = new Out
            // chunks are FULL chunk-sized in hdf5; edge chunks pad
            (r0 until (r0 + chunkRows)).foreach { r =>
              (0 until cols).foreach { c =>
                o.bytes(f32le(if (r < r1) vals(r * cols + c) else 0.0f))
              }
            }
            val raw = o.buf.toByteArray
            if (defl) DeflateCodec.zlibEncode(raw, raw.length) else raw
          }
          val msgs0 = Seq(
            0x0001 -> body(o => dspace(o, v2, Seq(rows.toLong, cols.toLong))),
            0x0003 -> body(dtypeF32)) ++
            (if (defl) Seq(0x000B -> body { o => // filter pipeline v1
              o.u8(1); o.u8(1) // version, nfilters
              o.u16(0); o.u32(0) // reserved
              o.u16(1) // filter id: deflate
              o.u16(0) // name length (none)
              o.u16(0) // flags: mandatory
              o.u16(1) // n client values
              o.u32(6) // level
            }) else Nil) ++
            Seq(0x0008 -> body { o => // layout v3 chunked
              o.u8(3); o.u8(2)
              o.u8(3) // dimensionality = rank + 1
              o.u64(btreeAddr)
              o.u32(chunkRows.toLong); o.u32(cols.toLong); o.u32(4L)
            })
          (if (v2) objHeaderV2(msgs0) else objHeaderV1(msgs0), chunks)
      }
    // filter-pipeline flags must be 0 (mandatory): rebuild helper
    // wrote it as such — see spec test pinning the bytes.

    // sizes of group machinery are fixed; compute layout iteratively
    // (addresses depend on header sizes which depend only on counts)
    val names = dss.map(_.name)
    // --- first pass with dummy addresses to size headers/chunks
    val sized = dss.map(d => buildDs(d, Seq(0L), 0L))
    val headerSizes = sized.map(_._1.length)
    val dataSizes = sized.map(_._2.map(_.length))

    val out = new Out
    out.bytes(SIG)
    if (!v2) {
      // ---------- superblock v0 + classic symbol-table root group
      // layout: [sb 96][root OH][btree][heap][SNOD][ds headers][data]
      val rootOh = objHeaderV1(Seq(0x0011 -> body { o =>
        o.u64(0L); o.u64(0L) // patched: btree addr, heap addr
      }))
      val rootOhAddr = 96L // superblock v0 incl. signature + root entry
      val btreeAddr = rootOhAddr + rootOh.length
      // group B-tree v1: sig TREE, type 0, level 0, entries=1
      // hdr: 4+1+1+2+8+8 then key0(8) child(8) key1(8)
      val btreeSize = 24 + 8 + 8 + 8
      val heapAddr = btreeAddr + btreeSize
      // local heap: HEAP, version, 3 reserved, data seg size, free
      // list head, data addr; data = "\0" + names (8-aligned each)
      val nameOffs = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      val heapData = {
        val o = new Out
        o.u8(0) // offset 0: empty string (btree key 0)
        var off = 1L
        names.foreach { n =>
          val pad = (8 - (off % 8)) % 8
          o.pad(pad.toInt); off += pad
          nameOffs(n) = off
          val b = n.getBytes("US-ASCII")
          o.bytes(b); o.u8(0); off += b.length + 1
        }
        val tail = (8 - (off % 8)) % 8
        o.pad(tail.toInt)
        o.buf.toByteArray
      }
      val heapHdrSize = 8 + 8 + 8 + 8 // sig+ver+res | dsz | free | addr
      val heapDataAddr = heapAddr + heapHdrSize
      val snodAddr = heapDataAddr + heapData.length
      val snodSize = 8 + names.length * 40 // sig+ver+res+count, entries
      var cursor = snodAddr + snodSize
      val dsHeaderAddrs = headerSizes.map { hs =>
        val a = cursor; cursor += hs; a
      }
      // data region (+ chunk btrees for chunked datasets)
      val dataAddrs = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      val btreeAddrs = scala.collection.mutable.ArrayBuffer.empty[Long]
      dss.zipWithIndex.foreach { case (d, i) =>
        d match {
          case _: DsI64 =>
            dataAddrs += Seq(cursor); btreeAddrs += 0L
            cursor += dataSizes(i).head
          case f: DsF32 =>
            val bts = 24 + dataSizes(i).length * 40 + 32
            btreeAddrs += cursor
            val dAddrs = scala.collection.mutable.ArrayBuffer.empty[Long]
            var da = cursor + bts
            dataSizes(i).foreach { sz => dAddrs += da; da += sz }
            dataAddrs += dAddrs.toSeq
            cursor = da
        }
      }
      val eof = cursor + (if (lieEof) 8 else 0)
      // ---- emit superblock v0
      out.u8(0) // superblock version
      out.u8(0); out.u8(0) // free space / root group version
      out.u8(0) // reserved
      out.u8(0) // shared header version
      out.u8(8); out.u8(8) // size of offsets / lengths
      out.u8(0) // reserved
      out.u16(4); out.u16(16) // leaf k, internal k
      out.u32(0) // file consistency flags
      out.u64(0L) // base address
      out.u64(-1L) // free space address (undefined)
      out.u64(eof) // END OF FILE ADDRESS (the audit)
      out.u64(-1L) // driver info
      // root group symbol table entry
      out.u64(0L) // link name offset
      out.u64(rootOhAddr)
      out.u32(1) // cache type: group
      out.u32(0) // reserved
      out.u64(btreeAddr); out.u64(heapAddr) // scratch: btree + heap
      // ---- root OH (patch the symbol table message addresses)
      val rootPatched = objHeaderV1(Seq(0x0011 -> body { o =>
        o.u64(btreeAddr); o.u64(heapAddr)
      }))
      out.bytes(rootPatched)
      // ---- group B-tree v1 (one leaf pointing at the one SNOD)
      out.bytes("TREE".getBytes("US-ASCII"))
      out.u8(0) // node type: group
      out.u8(0) // level
      out.u16(1) // entries used
      out.u64(-1L); out.u64(-1L) // left/right siblings
      out.u64(0L) // key 0: heap offset of "" (lowest)
      out.u64(snodAddr)
      out.u64(nameOffs(names.max)) // key 1: the highest name
      // ---- local heap
      out.bytes("HEAP".getBytes("US-ASCII"))
      out.u8(0); out.u8(0); out.u8(0); out.u8(0)
      out.u64(heapData.length.toLong)
      out.u64(-1L) // free list: none
      out.u64(heapDataAddr)
      out.bytes(heapData)
      // ---- SNOD (entries sorted by link name)
      out.bytes("SNOD".getBytes("US-ASCII"))
      out.u8(1); out.u8(0)
      out.u16(names.length)
      names.zipWithIndex.sortBy(_._1).foreach { case (n, i) =>
        out.u64(nameOffs(n))
        out.u64(dsHeaderAddrs(i))
        out.u32(0) // cache type: none
        out.u32(0)
        out.pad(16) // scratch
      }
      // ---- dataset headers (rebuilt with real addresses)
      dss.zipWithIndex.foreach { case (d, i) =>
        val (hdr, _) = buildDs(d, dataAddrs(i), btreeAddrs(i))
        if (hdr.length != headerSizes(i)) throw Malformed
        out.bytes(hdr)
      }
      // ---- chunk B-trees + data
      dss.zipWithIndex.foreach { case (d, i) =>
        d match {
          case _: DsI64 => out.bytes(sized(i)._2.head)
          case f: DsF32 =>
            val (_, chunks) = buildDs(f, dataAddrs(i), btreeAddrs(i))
            writeChunkBtree(out, f, chunks.map(_.length), dataAddrs(i),
              lieChunk)
            chunks.foreach(out.bytes)
        }
      }
      if (out.size != cursor) throw Malformed
      out.buf.toByteArray
    } else {
      // ---------- superblock v2: root OH directly, link messages
      val sbSize = 8 + 4 + 8 * 3 + 4 // fields + checksum (sans sig)
      // link messages in the root header (type 0x0006)
      def linkMsg(name: String, addr: Long): Array[Byte] = body { o =>
        o.u8(1) // version
        o.u8(0) // flags: hard link, 1-byte name length... (bit0-1=0)
        o.u8(name.length)
        o.bytes(name.getBytes("US-ASCII"))
        o.u64(addr)
      }
      // sizes: link msg depends only on name + addr → fixed; root
      // header size computable with dummy addrs
      val rootDummy = objHeaderV2(names.map(n => 0x0006 -> linkMsg(n, 0L)))
      val rootAddr = 8L + sbSize
      var cursor = rootAddr + rootDummy.length
      val dsHeaderAddrs = headerSizes.map { hs =>
        val a = cursor; cursor += hs; a
      }
      val dataAddrs = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      val btreeAddrs = scala.collection.mutable.ArrayBuffer.empty[Long]
      dss.zipWithIndex.foreach { case (d, i) =>
        d match {
          case _: DsI64 =>
            dataAddrs += Seq(cursor); btreeAddrs += 0L
            cursor += dataSizes(i).head
          case f: DsF32 =>
            val bts = 24 + dataSizes(i).length * 40 + 32
            btreeAddrs += cursor
            val dAddrs = scala.collection.mutable.ArrayBuffer.empty[Long]
            var da = cursor + bts
            dataSizes(i).foreach { sz => dAddrs += da; da += sz }
            dataAddrs += dAddrs.toSeq
            cursor = da
        }
      }
      val eof = cursor + (if (lieEof) 8 else 0)
      // ---- superblock v2
      val sb = new Out
      sb.u8(2) // version
      sb.u8(8); sb.u8(8) // sizes
      sb.u8(0) // consistency flags
      sb.u64(0L) // base address
      sb.u64(-1L) // superblock extension (undefined)
      sb.u64(eof)
      sb.u64(rootAddr)
      val sbb = sb.buf.toByteArray
      // checksum covers signature + fields
      val forCk = SIG ++ sbb
      out.bytes(sbb)
      out.u32(lookup3(forCk, 0, forCk.length, 0).toLong & 0xFFFFFFFFL)
      // ---- root OHDR
      val root = objHeaderV2(
        names.zip(dsHeaderAddrs).map { case (n, a) => 0x0006 -> linkMsg(n, a) })
      if (root.length != rootDummy.length) throw Malformed
      out.bytes(root)
      dss.zipWithIndex.foreach { case (d, i) =>
        val (hdr, _) = buildDs(d, dataAddrs(i), btreeAddrs(i))
        if (hdr.length != headerSizes(i)) throw Malformed
        out.bytes(hdr)
      }
      dss.zipWithIndex.foreach { case (d, i) =>
        d match {
          case _: DsI64 => out.bytes(sized(i)._2.head)
          case f: DsF32 =>
            val (_, chunks) = buildDs(f, dataAddrs(i), btreeAddrs(i))
            writeChunkBtree(out, f, chunks.map(_.length), dataAddrs(i),
              lieChunk)
            chunks.foreach(out.bytes)
        }
      }
      if (out.size != cursor) throw Malformed
      out.buf.toByteArray
    }
  }

  /** v1 raw-data chunk B-tree, level 0: keys carry (chunk byte size,
    * filter mask, offsets[rank+1]); one more key than children. */
  private def writeChunkBtree(out: Out, f: DsF32, sizes: Seq[Int],
                              addrs: Seq[Long], lieChunk: Boolean): Unit = {
    out.bytes("TREE".getBytes("US-ASCII"))
    out.u8(1) // node type: raw data chunks
    out.u8(0) // level
    out.u16(sizes.length)
    out.u64(-1L); out.u64(-1L)
    val offs = (0 until f.rows by f.chunkRows).toArray
    sizes.zipWithIndex.foreach { case (sz, i) =>
      val r0 = if (lieChunk && sizes.length >= 2)
        offs(if (i == 0) 1 else if (i == 1) 0 else i)
      else offs(i)
      out.u32(sz.toLong) // chunk size (filtered bytes)
      out.u32(0) // filter mask
      out.u64(r0.toLong); out.u64(0L); out.u64(0L) // offsets + elem dim 0
      out.u64(addrs(i))
    }
    // final key: one past the end
    out.u32(0); out.u32(0)
    val endRow = ((f.rows + f.chunkRows - 1) / f.chunkRows) * f.chunkRows
    out.u64(endRow.toLong); out.u64(f.cols.toLong); out.u64(0L)
  }

  // ------------------------------------------------------------ reader
  private final class In(val b: Array[Byte]) {
    def len: Int = b.length
    def u8(p: Long): Int = {
      if (p < 0 || p >= b.length) throw Malformed
      b(p.toInt) & 0xFF
    }
    def u16(p: Long): Int = u8(p) | (u8(p + 1) << 8)
    def u32(p: Long): Long = u16(p).toLong | (u16(p + 2).toLong << 16)
    def u64(p: Long): Long = u32(p) | (u32(p + 4) << 32)
    def ascii(p: Long, n: Int): String = {
      if (p < 0 || p + n > b.length) throw Malformed
      new String(b, p.toInt, n, "US-ASCII")
    }
    def slice(p: Long, n: Long): Array[Byte] = {
      if (p < 0 || n < 0 || p + n > b.length) throw Malformed
      java.util.Arrays.copyOfRange(b, p.toInt, (p + n).toInt)
    }
  }

  private final case class Msg(tpe: Int, body: Array[Byte])

  private def parseOhV1(in: In, addr: Long): Seq[Msg] = {
    if (in.u8(addr) != 1 || in.u8(addr + 1) != 0) throw Malformed
    val n = in.u16(addr + 2)
    val hsize = in.u32(addr + 8)
    var p = addr + 16 // 12-byte prefix + 4 pad (8-alignment)
    val msgs = scala.collection.mutable.ArrayBuffer.empty[Msg]
    var k = 0
    while (k < n) {
      if (p + 8 > in.len) throw Malformed
      val t = in.u16(p)
      val sz = in.u16(p + 2)
      if (sz % 8 != 0) throw Malformed
      if (t == 0x0010) throw Malformed // continuation: out of scope
      msgs += Msg(t, in.slice(p + 8, sz.toLong))
      p += 8 + sz
      k += 1
    }
    if (p - (addr + 16) != hsize) throw Malformed
    msgs.toSeq
  }

  private def parseOhV2(in: In, addr: Long): Seq[Msg] = {
    if (in.ascii(addr, 4) != "OHDR") throw Malformed
    if (in.u8(addr + 4) != 2) throw Malformed
    val flags = in.u8(addr + 5)
    if ((flags & 0x3) != 2 || (flags & 0xFC) != 0) throw Malformed
    val msize = in.u16(addr + 6)
    val bodyStart = addr + 8
    val ckAddr = bodyStart + msize
    val declared = in.u32(ckAddr)
    val got = lookup3(in.b, addr.toInt, (8 + msize), 0)
    if ((got.toLong & 0xFFFFFFFFL) != declared) throw Malformed
    var p = bodyStart
    val msgs = scala.collection.mutable.ArrayBuffer.empty[Msg]
    while (p < ckAddr) {
      if (p + 4 > ckAddr) throw Malformed
      val t = in.u8(p)
      val sz = in.u16(p + 1)
      if (in.u8(p + 3) != 0) throw Malformed // msg flags: none in scope
      if (t == 0x0010) throw Malformed
      if (p + 4 + sz > ckAddr) throw Malformed
      msgs += Msg(t, in.slice(p + 4, sz.toLong))
      p += 4 + sz
    }
    if (p != ckAddr) throw Malformed
    msgs.toSeq
  }

  private def one(msgs: Seq[Msg], tpe: Int): Msg = {
    val m = msgs.filter(_.tpe == tpe)
    if (m.length != 1) throw Malformed
    m.head
  }

  private final case class Space(dims: Seq[Long])
  private def parseSpace(b: Array[Byte]): Space = {
    if (b.isEmpty) throw Malformed
    val in = new In(b)
    b(0) match {
      case 1 =>
        val rank = in.u8(1)
        if (in.u8(2) != 0) throw Malformed // maxdims out of scope
        if (rank < 1 || rank > 2 || b.length < 8 + rank * 8) throw Malformed
        Space((0 until rank).map(i => in.u64(8 + i * 8)))
      case 2 =>
        val rank = in.u8(1)
        if (in.u8(2) != 0 || in.u8(3) != 1) throw Malformed
        if (rank < 1 || rank > 2 || b.length < 4 + rank * 8) throw Malformed
        Space((0 until rank).map(i => in.u64(4 + i * 8)))
      case _ => throw Malformed
    }
  }

  private sealed trait DT
  private case object DTI64 extends DT
  private case object DTF32 extends DT
  private def parseDtype(b: Array[Byte]): DT = {
    if (b.length < 8) throw Malformed
    val in = new In(b)
    val cls = b(0) & 0x0F
    val ver = (b(0) & 0xF0) >> 4
    if (ver != 1) throw Malformed
    cls match {
      case 0 =>
        // fixed-point: LE (bit0=0), signed (bit3=1), size 8, prec 64
        if ((b(1) & 0x01) != 0 || (b(1) & 0x08) == 0) throw Malformed
        if (in.u32(4) != 8L || in.u16(8) != 0 || in.u16(10) != 64)
          throw Malformed
        DTI64
      case 1 =>
        // IEEE float32 LE: the bit fields are the CONTRACT — a
        // float32 claiming an 11-bit exponent is a lie, not a dialect
        if ((b(1) & 0x01) != 0) throw Malformed
        if (in.u32(4) != 4L || in.u16(8) != 0 || in.u16(10) != 32)
          throw Malformed
        if (b.length < 20) throw Malformed
        if (in.u8(12) != 23 || in.u8(13) != 8 || in.u8(14) != 0 ||
            in.u8(15) != 23 || in.u32(16) != 127L) throw Malformed
        DTF32
      case _ => throw Malformed
    }
  }

  /** Walk one file strictly; None on any violation. */
  private[graft] def read(b0: Array[Byte]): Option[H5Info] =
    try {
      val in = new In(b0)
      if (b0.length < 16) throw Malformed
      if (!java.util.Arrays.equals(in.slice(0, 8), SIG)) throw Malformed
      val sver = in.u8(8)
      var nDs = 0
      var sumIds = 0L
      var nIds = 0L
      var nFeats = 0L
      var sumFeats = 0.0

      def walkDataset(msgs: Seq[Msg]): Unit = {
        nDs += 1
        val space = parseSpace(one(msgs, 0x0001).body)
        val dt = parseDtype(one(msgs, 0x0003).body)
        val lay = one(msgs, 0x0008).body
        if (lay.length < 2) throw Malformed
        val li = new In(lay)
        if (li.u8(0) != 3) throw Malformed // layout v3 only
        li.u8(1) match {
          case 1 => // contiguous
            val addr = li.u64(2)
            val size = li.u64(10)
            val elems = space.dims.product
            val elsize = dt match { case DTI64 => 8L; case DTF32 => 4L }
            // the size audit: declared byte count vs dataspace
            if (size != elems * elsize) throw Malformed
            val raw = in.slice(addr, size)
            dt match {
              case DTI64 =>
                var i = 0
                while (i < elems) {
                  sumIds += new In(raw).u64(8L * i); nIds += 1; i += 1
                }
              case DTF32 =>
                var i = 0
                while (i < elems) {
                  sumFeats += java.lang.Float.intBitsToFloat(
                    new In(raw).u32(4L * i).toInt)
                  nFeats += 1
                  i += 1
                }
            }
          case 2 => // chunked via the v1 B-tree
            if (li.u8(2) != 3) throw Malformed // rank+1
            val btAddr = li.u64(3)
            val cdim0 = li.u32(11)
            val cdim1 = li.u32(15)
            val elsize = li.u32(19)
            if (dt != DTF32 || elsize != 4L) throw Malformed
            if (space.dims.length != 2) throw Malformed
            val Seq(rows, cols) = space.dims
            if (cdim1 != cols) throw Malformed
            val filters = msgs.filter(_.tpe == 0x000B)
            val deflate = filters.length match {
              case 0 => false
              case 1 =>
                val fb = filters.head.body
                val fi2 = new In(fb)
                if (fi2.u8(0) != 1 || fi2.u8(1) != 1) throw Malformed
                if (fi2.u16(8) != 1) throw Malformed // deflate only
                true
              case _ => throw Malformed
            }
            // B-tree node
            if (in.ascii(btAddr, 4) != "TREE") throw Malformed
            if (in.u8(btAddr + 4) != 1) throw Malformed
            if (in.u8(btAddr + 5) != 0) throw Malformed // level 0 scope
            val nEnt = in.u16(btAddr + 6)
            var p = btAddr + 24
            var expectRow = 0L
            var i = 0
            while (i < nEnt) {
              val csz = in.u32(p)
              val mask = in.u32(p + 4)
              if (mask != 0L) throw Malformed
              val r0 = in.u64(p + 8)
              val c0 = in.u64(p + 16)
              // key ORDER + TILING: chunks must start exactly where
              // the previous ended (the lying-offset class)
              if (r0 != expectRow || c0 != 0L) throw Malformed
              if (in.u64(p + 24) != 0L) throw Malformed
              val addr = in.u64(p + 32)
              val raw0 = in.slice(addr, csz)
              val raw = if (deflate)
                DeflateCodec.zlibDecode(raw0).getOrElse(throw Malformed)
              else raw0
              // decompressed chunk size == full chunk elements x 4
              if (raw.length.toLong != cdim0 * cdim1 * 4L) throw Malformed
              val keep = math.min(cdim0, rows - expectRow)
              var r = 0
              while (r < keep) {
                var c = 0
                while (c < cols) {
                  sumFeats += java.lang.Float.intBitsToFloat(
                    new In(raw).u32((r * cdim1 + c) * 4L).toInt)
                  nFeats += 1
                  c += 1
                }
                r += 1
              }
              expectRow += cdim0
              p += 40
              i += 1
            }
            // final key: one past the end, and it must COVER the space
            if (expectRow < rows) throw Malformed
            if (in.u64(p + 8) != expectRow) throw Malformed
          case _ => throw Malformed
        }
      }

      sver match {
        case 0 =>
          if (in.u8(13) != 8 || in.u8(14) != 8) throw Malformed
          val eof = in.u64(40)
          if (eof != b0.length.toLong) throw Malformed // THE audit
          val rootOh = in.u64(64)
          val rootMsgs = parseOhV1(in, rootOh)
          val st = one(rootMsgs, 0x0011).body
          val sti = new In(st)
          val btAddr = sti.u64(0)
          val heapAddr = sti.u64(8)
          if (in.ascii(btAddr, 4) != "TREE") throw Malformed
          if (in.u8(btAddr + 4) != 0 || in.u8(btAddr + 5) != 0) throw Malformed
          val nSnods = in.u16(btAddr + 6)
          if (in.ascii(heapAddr, 4) != "HEAP") throw Malformed
          val heapDataAddr = in.u64(heapAddr + 24)
          var sp = btAddr + 24 + 8 // skip key 0
          var s = 0
          var prevName = ""
          while (s < nSnods) {
            val snodAddr = in.u64(sp)
            if (in.ascii(snodAddr, 4) != "SNOD") throw Malformed
            val nEnt = in.u16(snodAddr + 6)
            var ep = snodAddr + 8
            var e = 0
            while (e < nEnt) {
              val nameOff = in.u64(ep)
              val ohAddr = in.u64(ep + 8)
              // name (for the ordering audit: SNOD entries sorted)
              var q = heapDataAddr + nameOff
              val sb2 = new StringBuilder
              while (in.u8(q) != 0) { sb2.append(in.u8(q).toChar); q += 1 }
              val nm = sb2.toString
              if (nm <= prevName) throw Malformed
              prevName = nm
              walkDataset(parseOhV1(in, ohAddr))
              ep += 40
              e += 1
            }
            sp += 16
            s += 1
          }
        case 2 =>
          val eof = in.u64(8 + 4 + 16)
          if (eof != b0.length.toLong) throw Malformed
          val rootAddr = in.u64(8 + 4 + 24)
          val declared = in.u32(8 + 4 + 32)
          val got = lookup3(b0, 0, 8 + 4 + 32, 0)
          if ((got.toLong & 0xFFFFFFFFL) != declared) throw Malformed
          val rootMsgs = parseOhV2(in, rootAddr)
          val links = rootMsgs.filter(_.tpe == 0x0006)
          if (links.isEmpty) throw Malformed
          var prevName = ""
          links.foreach { m =>
            val li = new In(m.body)
            if (li.u8(0) != 1 || li.u8(1) != 0) throw Malformed
            val nl = li.u8(2)
            val nm = li.ascii(3, nl)
            if (nm <= prevName) { /* link order not mandated in v2 */ }
            prevName = nm
            val addr = li.u64(3 + nl)
            walkDataset(parseOhV2(in, addr))
          }
        case _ => throw Malformed
      }
      Some(H5Info(sver, nDs, sumIds, nIds, nFeats, sumFeats))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      case _: MatchError => None
      case _: StringIndexOutOfBoundsException => None
    }
}

/** In-plan synthesizer + gate for d172: each doc becomes an HDF5 file
  * with two datasets — `ids` (1-D int64, contiguous) and `feats`
  * (K x 4 float32, CHUNKED in two row-chunks, deflate-filtered for
  * docs with docId%3==0) — superblock v0 for even docs, v2 for odd
  * (both lineages through one gate). Values are closed forms
  * (quarter-floats — the d171 exactness discipline).
  *
  * Damage %7: 0 → truncation (the EOF-address audit — hdf5 has no
  * trailer, the superblock's eof IS the integrity tell); 3 → a LYING
  * dataspace (ids claims one more element than the contiguous layout
  * carries); 5 → SWAPPED chunk-key offsets in the feats B-tree (every
  * byte present, only the key-order/tiling audit objects). */
object Hdf5Sim {
  import Hdf5._

  private[graft] def k(docId: Long): Int = (4 + docId % 5).toInt

  private[graft] def idVal(docId: Long, i: Int): Long =
    docId * 1000 + i * 7

  private[graft] def featVal(docId: Long, r: Int, c: Int): Float =
    ((docId * 11 + r * 5 + c * 3) % 1000) / 4.0f

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val kk = k(docId)
    val ids = DsI64("ids", Array.tabulate(kk)(idVal(docId, _)))
    val feats = DsF32("feats", kk, 4,
      Array.tabulate(kk * 4)(i => featVal(docId, i / 4, i % 4)),
      chunkRows = (kk + 1) / 2, deflate = docId % 3 == 0)
    val v2 = docId % 2 == 1
    (docId % 7) match {
      case 0 =>
        val clean = write(Seq(ids, feats), v2)
        java.util.Arrays.copyOf(clean, clean.length - 5)
      case 3 => write(Seq(ids, feats), v2, lieSpace = true)
      case 5 => write(Seq(ids, feats), v2, lieChunk = true)
      case _ => write(Seq(ids, feats), v2)
    }
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("sb_version", LongType),
    StructField("n_datasets", LongType),
    StructField("n_ids", LongType),
    StructField("sum_ids", LongType),
    StructField("n_feats", LongType),
    StructField("sum_feats", DoubleType)))

  /** Batched strict walk + audit → per-doc stats with quarantine. */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            Hdf5.read(payloadFor(id)) match {
              case Some(info) =>
                Row(id, "ok", info.superVersion.toLong,
                  info.nDatasets.toLong, info.nIds, info.sumIds,
                  info.nFeats, info.sumFeats)
              case None =>
                Row(id, "quarantined", null, null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
