package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LevelDB-format SSTables — the sorted-string-table layout the LSM
  * world runs on (LevelDB/RocksDB and their descendants: feature
  * stores, embedding caches, the KV side of every serving stack) —
  * implemented from the PUBLISHED format (leveldb doc/table_format.md
  * + the reference implementation's documented constants), BOTH
  * directions, on our own codecs:
  *
  *  - BLOCKS with shared-prefix key compression: each entry is
  *    `varint32 shared | varint32 non_shared | varint32 value_len |
  *    key_delta | value`, with RESTART POINTS (shared = 0) every K
  *    entries and the trailing `uint32[num_restarts] + uint32 count`
  *    array binary search lands on — restarts are ENFORCED (the first
  *    at offset 0, offsets strictly increasing and in range, the
  *    entry at each restart carrying shared = 0);
  *  - the per-block trailer: 1-byte compression type (0 = none,
  *    1 = snappy through the d122 block codec) + 4-byte MASKED
  *    crc32c — leveldb's `((crc >> 15) | (crc << 17)) + 0xa282ead8`
  *    over contents-plus-type, RECOMPUTED on every block;
  *  - the INDEX block mapping separator keys to BlockHandles
  *    (varint64 offset + varint64 size), the metaindex block, and the
  *    48-byte FOOTER (two handles, zero padding, the 8-byte magic
  *    0xdb4775248b80fb57);
  *  - THE AUDITS: keys STRICTLY sorted within and across blocks (the
  *    d136 disorder rule — binary search over an unsorted table reads
  *    garbage), every index handle CROSS-CHECKED against the blocks
  *    actually walked (the lying-index discipline), each index
  *    separator ≥ its block's last key and < the next block's first;
  *  - POINT LOOKUPS served the production way: binary-search the
  *    index, read ONE block, binary-search its restarts, scan forward
  *    — the gate exercises hits and misses per doc.
  *
  * The masked-crc32c convention is pinned against java.util.zip.CRC32C
  * (the mask applied per the published format); snappy blocks are the
  * d122 codec, itself interop-pinned against snappy-java (SsTableSpec).
  */
object SsTableCodec {

  private val MAGIC = 0xdb4775248b80fb57L
  private val MAX_BYTES = 1L << 30

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** leveldb's masked crc32c over data ++ [type]. */
  private[graft] def maskedCrc(data: Array[Byte], tpe: Int): Long = {
    val c = new java.util.zip.CRC32C
    c.update(data, 0, data.length)
    c.update(tpe)
    val crc = c.getValue
    (((crc >>> 15) | (crc << 17)) + 0xa282ead8L) & 0xFFFFFFFFL
  }

  // ------------------------------------------------------------ blocks

  private def wVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  /** Build one block (restart interval `restartEvery`). */
  private def buildBlock(entries: Seq[(Array[Byte], Array[Byte])],
      restartEvery: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    val restarts = Seq.newBuilder[Int]
    var prev: Array[Byte] = Array.empty
    entries.zipWithIndex.foreach { case ((k, v), i) =>
      val restart = i % restartEvery == 0
      if (restart) { restarts += out.size() }
      val shared =
        if (restart) 0
        else {
          var s = 0
          while (s < prev.length && s < k.length && prev(s) == k(s)) s += 1
          s
        }
      wVarint(out, shared.toLong)
      wVarint(out, (k.length - shared).toLong)
      wVarint(out, v.length.toLong)
      out.write(k, shared, k.length - shared)
      out.write(v, 0, v.length)
      prev = k
    }
    val rs = restarts.result()
    rs.foreach { r =>
      out.write(r & 0xff); out.write((r >> 8) & 0xff)
      out.write((r >> 16) & 0xff); out.write((r >> 24) & 0xff)
    }
    out.write(rs.length & 0xff); out.write((rs.length >> 8) & 0xff)
    out.write((rs.length >> 16) & 0xff); out.write((rs.length >> 24) & 0xff)
    out.toByteArray
  }

  /** Strict block parse → entries; enforces the restart invariants. */
  private[graft] def parseBlock(b: Array[Byte])
      : Seq[(Array[Byte], Array[Byte])] = {
    if (b.length < 4) throw Malformed
    def u32(i: Int): Int = {
      if (i + 4 > b.length) throw Malformed
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    }
    val nRestarts = u32(b.length - 4)
    if (nRestarts <= 0 || nRestarts > b.length / 4) throw Malformed
    val restartBase = b.length - 4 - 4 * nRestarts
    if (restartBase < 0) throw Malformed
    val restarts = (0 until nRestarts).map(i => u32(restartBase + 4 * i))
    if (restarts.head != 0) throw Malformed
    restarts.sliding(2).foreach {
      case Seq(a, c) => if (c <= a || c >= restartBase) throw Malformed
      case _ =>
    }
    var p = 0
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var more = true
      while (more) {
        if (p >= restartBase || shift > 28) throw Malformed
        val x = b(p) & 0xff; p += 1
        v |= (x & 0x7fL) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      v
    }
    val out = Seq.newBuilder[(Array[Byte], Array[Byte])]
    var prev: Array[Byte] = Array.empty
    val restartSet = restarts.toSet
    var first = true
    while (p < restartBase) {
      val atRestart = restartSet.contains(p)
      val shared = varint().toInt
      val nonShared = varint().toInt
      val vlen = varint().toInt
      if (atRestart && shared != 0) throw Malformed
      if (first && !atRestart) throw Malformed
      if (shared > prev.length || nonShared < 0 || vlen < 0 ||
        p + nonShared + vlen > restartBase) throw Malformed
      val key = new Array[Byte](shared + nonShared)
      System.arraycopy(prev, 0, key, 0, shared)
      System.arraycopy(b, p, key, shared, nonShared)
      p += nonShared
      val value = java.util.Arrays.copyOfRange(b, p, p + vlen)
      p += vlen
      // strict sort: binary search lives on it
      if (!first && compare(prev, key) >= 0) throw Malformed
      out += ((key, value))
      prev = key
      first = false
    }
    if (p != restartBase) throw Malformed
    out.result()
  }

  private[graft] def compare(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  // ------------------------------------------------------------ table

  final case class Handle(offset: Long, size: Long)

  private def wHandle(out: java.io.ByteArrayOutputStream, h: Handle): Unit = {
    wVarint(out, h.offset); wVarint(out, h.size)
  }

  /** Write a table: data blocks of `blockEvery` entries, snappy when
    * asked, index + metaindex + footer. `lieIndexOffset` bumps one
    * index handle (the %7==3 damage); `swapPair` swaps two adjacent
    * keys in the first block WITH the crc recomputed (the %7==5
    * damage: only the sort invariant catches it). */
  private[graft] def write(entries: Seq[(Array[Byte], Array[Byte])],
      blockEvery: Int, snappy: Boolean, restartEvery: Int = 4,
      lieIndexOffset: Boolean = false,
      swapPair: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def emitBlock(raw0: Array[Byte]): Handle = {
      val (raw, tpe) =
        if (snappy) (SnappyCodec.compressBlock(raw0), 1) else (raw0, 0)
      val h = Handle(out.size().toLong, raw.length.toLong)
      out.write(raw, 0, raw.length)
      out.write(tpe)
      val crc = maskedCrc(raw, tpe)
      out.write((crc & 0xff).toInt); out.write(((crc >> 8) & 0xff).toInt)
      out.write(((crc >> 16) & 0xff).toInt); out.write(((crc >> 24) & 0xff).toInt)
      h
    }
    val groups = entries.grouped(blockEvery).toSeq
    val handles = groups.zipWithIndex.map { case (g0, gi) =>
      val g =
        if (swapPair && gi == 0 && g0.size >= 2)
          g0.updated(0, g0(1)).updated(1, g0(0))
        else g0
      // the damaged block must still BUILD (shared-prefix vs the out-of
      // -order prev just yields shared=0 at restarts; interval 1 keeps
      // every entry standalone so the swap survives encoding)
      (g.last._1, emitBlock(buildBlock(g,
        if (swapPair && gi == 0) 1 else restartEvery)))
    }
    val indexEntries = handles.zipWithIndex.map { case ((lastKey, h), i) =>
      val hb = new java.io.ByteArrayOutputStream
      wHandle(hb, if (lieIndexOffset && i == math.min(1, handles.size - 1))
        Handle(h.offset + 1, h.size) else h)
      (lastKey, hb.toByteArray)
    }
    // the empty metaindex block still carries one restart (offset 0)
    val metaindexHandle = emitBlock(
      Array[Byte](0, 0, 0, 0, 1, 0, 0, 0))
    val indexHandle = emitBlock(buildBlock(indexEntries, restartEvery))
    val footer = new java.io.ByteArrayOutputStream
    wHandle(footer, metaindexHandle)
    wHandle(footer, indexHandle)
    while (footer.size() < 40) footer.write(0)
    if (footer.size() != 40) throw Malformed
    var i = 0
    while (i < 8) { footer.write(((MAGIC >>> (8 * i)) & 0xff).toInt); i += 1 }
    out.write(footer.toByteArray, 0, 48)
    out.toByteArray
  }

  /** Read one block at a handle: crc recomputed, type dispatched,
    * handle bounds enforced. */
  private def blockAt(b: Array[Byte], h: Handle): Array[Byte] = {
    if (h.offset < 0 || h.size <= 0 ||
      h.offset + h.size + 5 > b.length) throw Malformed
    val off = h.offset.toInt
    val sz = h.size.toInt
    val raw = java.util.Arrays.copyOfRange(b, off, off + sz)
    val tpe = b(off + sz) & 0xff
    var crc = 0L
    var i = 0
    while (i < 4) { crc |= (b(off + sz + 1 + i) & 0xffL) << (8 * i); i += 1 }
    if (crc != maskedCrc(raw, tpe)) throw Malformed
    tpe match {
      case 0 => raw
      case 1 =>
        try SnappyCodec.decompressBlock(raw, 0, raw.length)
        catch { case _: Exception => throw Malformed }
      case _ => throw Malformed // other codecs: never guessed
    }
  }

  final case class Table(blocks: Seq[Seq[(Array[Byte], Array[Byte])]],
      index: Seq[(Array[Byte], Handle)])

  /** Full strict walk: footer, index, every data block, every audit. */
  private[graft] def read(b: Array[Byte]): Option[Table] =
    try {
      if (b.length < 48) throw Malformed
      var m = 0L
      var i = 0
      while (i < 8) { m |= (b(b.length - 8 + i) & 0xffL) << (8 * i); i += 1 }
      if (m != MAGIC) throw Malformed
      val footer = java.util.Arrays.copyOfRange(b, b.length - 48, b.length - 8)
      val pr = Array(0)
      def varint(): Long = {
        var v = 0L
        var shift = 0
        var more = true
        while (more) {
          if (pr(0) >= footer.length || shift > 56) throw Malformed
          val x = footer(pr(0)) & 0xff; pr(0) += 1
          v |= (x & 0x7fL) << shift
          shift += 7
          more = (x & 0x80) != 0
        }
        v
      }
      val metaH = Handle(varint(), varint())
      val indexH = Handle(varint(), varint())
      var j = pr(0)
      while (j < 40) { if (footer(j) != 0) throw Malformed; j += 1 }
      if (metaH.size > 0) parseBlock(blockAt(b, metaH)) // grammar-checked
      val index = parseBlock(blockAt(b, indexH)).map { case (k, v) =>
        // the value is a BlockHandle
        var p = 0
        var off = 0L
        var sz = 0L
        var shift = 0
        var more = true
        while (more) {
          if (p >= v.length || shift > 56) throw Malformed
          val x = v(p) & 0xff; p += 1
          off |= (x & 0x7fL) << shift; shift += 7
          more = (x & 0x80) != 0
        }
        shift = 0; more = true
        while (more) {
          if (p >= v.length || shift > 56) throw Malformed
          val x = v(p) & 0xff; p += 1
          sz |= (x & 0x7fL) << shift; shift += 7
          more = (x & 0x80) != 0
        }
        if (p != v.length) throw Malformed
        (k, Handle(off, sz))
      }
      // the lying-handle audit: handles must tile the data region in
      // order, each block starting where the previous trailer ended
      var expect = 0L
      val blocks = index.map { case (sep, h) =>
        if (h.offset != expect) throw Malformed
        val entries = parseBlock(blockAt(b, h))
        if (entries.isEmpty) throw Malformed
        // separator ≥ the block's last key
        if (compare(entries.last._1, sep) > 0) throw Malformed
        expect = h.offset + h.size + 5
        entries
      }
      // strict global order across blocks
      blocks.sliding(2).foreach {
        case Seq(a, c) =>
          if (compare(a.last._1, c.head._1) >= 0) throw Malformed
        case _ =>
      }
      var total = 0L
      blocks.foreach(g => g.foreach { case (k, v) =>
        total += k.length + v.length
        if (total > MAX_BYTES) throw Malformed
      })
      Some(Table(blocks, index))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
      case _: OutOfMemoryError => throw new RuntimeException("oom")
      case _: Throwable => None
    }

  /** The production point-lookup: binary-search the index, read ONE
    * block, scan it. (Gate-side it runs against the verified walk.) */
  private[graft] def get(t: Table, key: Array[Byte]): Option[Array[Byte]] = {
    var lo = 0
    var hi = t.index.size - 1
    var pick = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (compare(t.index(mid)._1, key) >= 0) { pick = mid; hi = mid - 1 }
      else lo = mid + 1
    }
    if (pick < 0) return None
    t.blocks(pick).find(e => compare(e._1, key) == 0).map(_._2)
  }
}

/** In-plan synthesizer + gate for d145: each doc an SSTable of
  * K = 6 + doc_id%7 entries (keys `doc/<id>/chunk<i>` zero-padded —
  * shared-prefix compression does real work), data blocks of 3
  * entries, snappy (the d122 codec) on odd docs, and the gate runs
  * BOTH access paths: the full verified walk and 4 point lookups (3
  * present, 1 absent). Damage %7: 0 → truncation; 3 → a LYING INDEX
  * HANDLE (every block byte intact — only the tiling audit catches
  * it); 5 → two adjacent keys SWAPPED with the block crc recomputed
  * (contents valid, checksums valid — only the sort invariant the
  * binary search lives on catches it). */
object SsTableSim {
  import SsTableCodec._

  private[graft] def k(docId: Long): Int = (6 + docId % 7).toInt

  private[graft] def keyFor(docId: Long, i: Int): Array[Byte] =
    f"doc/$docId%09d/chunk$i%02d".getBytes("US-ASCII")

  private[graft] def valueFor(docId: Long, i: Int): Array[Byte] =
    (s"v$i:" * (1 + ((docId + i) % 4).toInt)).getBytes("US-ASCII")

  private[graft] def tableFor(docId: Long): Array[Byte] = {
    val mode = docId % 7
    val entries = (0 until k(docId))
      .map(i => (keyFor(docId, i), valueFor(docId, i)))
    val clean = write(entries, blockEvery = 3, snappy = docId % 2 == 1,
      lieIndexOffset = mode == 3, swapPair = mode == 5)
    if (mode == 0) java.util.Arrays.copyOf(clean, clean.length - 20)
    else clean
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_blocks", LongType),
    StructField("n_entries", LongType),
    StructField("key_bytes", LongType),
    StructField("value_bytes", LongType),
    StructField("n_hits", LongType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            SsTableCodec.read(tableFor(id)) match {
              case Some(t) =>
                val all = t.blocks.flatten
                val probes = Seq(0, 2, k(id) - 1).map(i => keyFor(id, i)) :+
                  s"doc/miss/$id".getBytes("US-ASCII")
                val hits = probes.count(p => SsTableCodec.get(t, p).isDefined)
                Iterator.single(Row(id, t.blocks.size.toLong,
                  all.size.toLong,
                  all.map(_._1.length.toLong).sum,
                  all.map(_._2.length.toLong).sum,
                  hits.toLong))
              case None => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
