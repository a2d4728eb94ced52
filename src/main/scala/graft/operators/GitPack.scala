package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Git packfiles — the storage format of every code corpus (The
  * Stack, Software Heritage: corpus ingest means walking clones, and
  * clones mean packs) — implemented from the published format
  * documentation (gitformat-pack(5): pack v2 + idx v2) on top of OUR
  * OWN primitives: zlib/DEFLATE from d124, SHA-1 from d136. BOTH
  * directions, no borrowed codec:
  *
  *  - the OBJECT grammar: an id IS `SHA-1("<type> <len>\0" content)`,
  *    so every object the walker yields has its id RECOMPUTED and
  *    checked against the index (the strongest identity audit a
  *    format can offer — a single corrupt byte anywhere changes it);
  *    canonical TREE entries (`<mode> <name>\0` + raw 20-byte id,
  *    name-sorted, order ENFORCED) and commit linkage (the commit's
  *    `tree` line must name the tree actually in the pack, the tree's
  *    entries must name the blobs — dangling references quarantine);
  *  - PACK v2: `PACK` + version + count, per-object size/type varint
  *    headers (4+7-bit little groups), zlib streams mid-buffer (the
  *    d124 inflater consuming exactly its bytes), and the pack
  *    TRAILER: SHA-1 of everything before it, recomputed;
  *  - BOTH delta encodings: OFS_DELTA (the +1-biased big-endian
  *    offset varint, base must lie EARLIER in the pack) and REF_DELTA
  *    (20-byte base id, which must resolve within this pack — thin
  *    packs quarantine, never guessed); the delta INSTRUCTION stream
  *    applied strictly — declared source size must equal the actual
  *    base length (a delta that lies about its base reconstructs
  *    garbage), copies bounded, cmd 0 reserved, the result must hit
  *    the declared target size exactly, no trailing instructions;
  *  - IDX v2: magic/version, the 256-entry FANOUT (monotone, each
  *    bucket consistent with the sorted id table, total == count),
  *    per-object CRC32 RECOMPUTED over the object's compressed span,
  *    and offsets CROSS-CHECKED against the byte positions actually
  *    walked (the d134/d140 lying-index discipline — the idx exists
  *    for random access, so its offsets are exactly the field worth
  *    auditing).
  *
  * Interop is pinned BOTH directions against the git CLI (the
  * sqlite3/GNU-tar precedent): `git index-pack` accepts our packs and
  * emits an idx BYTE-IDENTICAL to ours, and packs written by `git
  * pack-objects` from a real repository — including its own delta
  * choices — walk through this reader with every audit ON
  * (GitPackSpec).
  */
object GitObjects {

  /** `SHA-1("<type> <size>\0" ++ content)` — the object id. */
  def objSha(tpe: String, content: Array[Byte]): Array[Byte] = {
    val header = (s"$tpe ${content.length}" + "\u0000").getBytes("US-ASCII")
    val buf = new Array[Byte](header.length + content.length)
    System.arraycopy(header, 0, buf, 0, header.length)
    System.arraycopy(content, 0, buf, header.length, content.length)
    Sha1.hash(buf, 0, buf.length)
  }

  def hex(sha: Array[Byte]): String =
    sha.map(b => f"${b & 0xff}%02x").mkString

  /** Canonical tree bytes: `<mode> <name>\0` + raw id, ordered by
    * git's base_name_compare — raw UTF-8 bytes compared unsigned,
    * with a directory (mode 40000) entry keyed as name+"/". This is
    * the same key the audit enforces, so writer and walker agree on
    * the one canonical order real git produces. */
  def tree(entries: Seq[(String, String, Array[Byte])]): Array[Byte] = {
    def key(mode: String, name: String): Seq[Int] = {
      val base = name.getBytes("UTF-8")
      val k = if (mode == "40000") base :+ '/'.toByte else base
      k.toSeq.map(_ & 0xFF)
    }
    val out = new java.io.ByteArrayOutputStream
    entries
      .sortBy { case (mode, name, _) => key(mode, name) }(
        math.Ordering.Implicits.seqOrdering[Seq, Int])
      .foreach { case (mode, name, sha) =>
        out.write(s"$mode $name".getBytes("UTF-8"))
        out.write(0)
        out.write(sha)
      }
    out.toByteArray
  }

  def commit(treeSha: Array[Byte], msg: String): Array[Byte] =
    (s"tree ${hex(treeSha)}\n" +
      "author A U Thor <author@example.com> 1700000000 +0000\n" +
      "committer A U Thor <author@example.com> 1700000000 +0000\n" +
      s"\n$msg\n").getBytes("UTF-8")
}

object GitPack {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // pack object types
  val T_COMMIT = 1
  val T_TREE = 2
  val T_BLOB = 3
  private val T_OFS_DELTA = 6
  private val T_REF_DELTA = 7

  private def typeName(t: Int): String = t match {
    case T_COMMIT => "commit"
    case T_TREE => "tree"
    case T_BLOB => "blob"
    case 4 => "tag"
    case _ => throw Malformed
  }

  // ------------------------------------------------------ delta codec

  /** Render a delta (git pack-objects' instruction stream): here the
    * gate's shape — copy the whole base, insert a suffix. */
  private[graft] def deltaCopyPlusInsert(baseLen: Int, insert: Array[Byte],
      lieSrcSize: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def sizeVarint(v0: Long): Unit = {
      var v = v0
      while (v >= 0x80) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    sizeVarint(baseLen + (if (lieSrcSize) 1 else 0))
    sizeVarint(baseLen.toLong + insert.length)
    // copy instruction: offset 0 (no offset bytes), explicit size bytes
    var cmd = 0x80
    var sizeBytes = 0
    var rem = baseLen
    while (rem != 0) { sizeBytes += 1; rem >>>= 8 }
    var i = 0
    while (i < sizeBytes) { cmd |= 0x10 << i; i += 1 }
    out.write(cmd)
    i = 0
    while (i < sizeBytes) { out.write((baseLen >> (8 * i)) & 0xff); i += 1 }
    // insert instructions: ≤127-byte literals
    var p = 0
    while (p < insert.length) {
      val n = math.min(127, insert.length - p)
      out.write(n)
      out.write(insert, p, n)
      p += n
    }
    out.toByteArray
  }

  /** Strict delta application. `strict = false` (writer-internal only)
    * skips the declared-source-size check so the %7==5 damage can be
    * PLANTED while the true content is still computed — the read path
    * is always strict. */
  private[graft] def applyDelta(base: Array[Byte], delta: Array[Byte],
      strict: Boolean = true): Array[Byte] = {
    var p = 0
    def u8(): Int = {
      if (p >= delta.length) throw Malformed
      val v = delta(p) & 0xff; p += 1; v
    }
    def sizeVarint(): Long = {
      var v = 0L
      var shift = 0
      var more = true
      while (more) {
        if (shift > 56) throw Malformed
        val b = u8()
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    val srcSize = sizeVarint()
    if (strict && srcSize != base.length)
      throw Malformed // a delta that lies about its base
    val tgtSize = sizeVarint()
    if (tgtSize < 0 || tgtSize > (base.length.toLong + delta.length) * 64 + 65536)
      throw Malformed
    val out = new java.io.ByteArrayOutputStream(tgtSize.toInt)
    while (p < delta.length) {
      val cmd = u8()
      if ((cmd & 0x80) != 0) {
        var off = 0L
        var sz = 0L
        var i = 0
        while (i < 4) { if ((cmd & (1 << i)) != 0) off |= u8().toLong << (8 * i); i += 1 }
        i = 0
        while (i < 3) { if ((cmd & (0x10 << i)) != 0) sz |= u8().toLong << (8 * i); i += 1 }
        if (sz == 0) sz = 0x10000
        if (off < 0 || sz <= 0 || off + sz > base.length) throw Malformed
        out.write(base, off.toInt, sz.toInt)
      } else if (cmd != 0) {
        if (p + cmd > delta.length) throw Malformed
        out.write(delta, p, cmd)
        p += cmd
      } else throw Malformed // cmd 0 is reserved
    }
    val res = out.toByteArray
    if (res.length.toLong != tgtSize) throw Malformed
    res
  }

  // ------------------------------------------------------ pack writer

  sealed trait Entry
  final case class Full(tpe: Int, content: Array[Byte]) extends Entry
  /** Delta against the entry at `baseIdx` (must be earlier). */
  final case class OfsDelta(baseIdx: Int, delta: Array[Byte]) extends Entry
  final case class RefDelta(baseIdx: Int, delta: Array[Byte]) extends Entry

  final case class Written(pack: Array[Byte], idx: Array[Byte],
      shas: Seq[Array[Byte]], offsets: Seq[Long])

  /** Write pack v2 + idx v2. Resolves deltas to compute ids. */
  private[graft] def write(entries: Seq[Entry],
      lieIdxOffset: Boolean = false): Written = {
    val out = new java.io.ByteArrayOutputStream
    out.write("PACK".getBytes("US-ASCII"))
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be32(2)
    be32(entries.size)
    val contents = new Array[Array[Byte]](entries.size)
    val types = new Array[Int](entries.size)
    val offsets = new Array[Long](entries.size)
    val crcs = new Array[Long](entries.size)
    entries.zipWithIndex.foreach { case (e, i) =>
      offsets(i) = out.size().toLong
      val start = out.size()
      def header(tpe: Int, size: Long): Unit = {
        var first = (tpe << 4) | (size & 0x0f).toInt
        var rest = size >>> 4
        if (rest != 0) first |= 0x80
        out.write(first)
        while (rest != 0) {
          var b = (rest & 0x7f).toInt
          rest >>>= 7
          if (rest != 0) b |= 0x80
          out.write(b)
        }
      }
      e match {
        case Full(tpe, c) =>
          header(tpe, c.length.toLong)
          out.write(DeflateCodec.zlibEncode(c, 16384))
          contents(i) = c
          types(i) = tpe
        case OfsDelta(baseIdx, d) =>
          header(T_OFS_DELTA, d.length.toLong)
          // the +1-biased big-endian offset varint
          var ofs = offsets(i) - offsets(baseIdx)
          val bytes = scala.collection.mutable.ArrayBuffer[Int]((ofs & 0x7f).toInt)
          ofs >>= 7
          while (ofs > 0) {
            ofs -= 1
            bytes.prepend(((ofs & 0x7f) | 0x80).toInt)
            ofs >>= 7
          }
          bytes.foreach(out.write)
          out.write(DeflateCodec.zlibEncode(d, 16384))
          contents(i) = applyDelta(contents(baseIdx), d, strict = false)
          types(i) = types(baseIdx)
        case RefDelta(baseIdx, d) =>
          header(T_REF_DELTA, d.length.toLong)
          out.write(GitObjects.objSha(typeName(types(baseIdx)),
            contents(baseIdx)))
          out.write(DeflateCodec.zlibEncode(d, 16384))
          contents(i) = applyDelta(contents(baseIdx), d, strict = false)
          types(i) = types(baseIdx)
      }
      val span = out.toByteArray
      val crc = new java.util.zip.CRC32
      crc.update(span, start, span.length - start)
      crcs(i) = crc.getValue
    }
    val body = out.toByteArray
    val trailer = Sha1.hash(body, 0, body.length)
    out.write(trailer)
    val pack = out.toByteArray
    val shas = entries.indices
      .map(i => GitObjects.objSha(typeName(types(i)), contents(i)))
    val idx = writeIdx(shas, crcs, offsets, trailer, lieIdxOffset)
    Written(pack, idx, shas, offsets.toSeq)
  }

  private def writeIdx(shas: Seq[Array[Byte]], crcs: Seq[Long],
      offsets: Seq[Long], packSha: Array[Byte],
      lieOffset: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def be32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    out.write(Array[Byte](-1, 0x74, 0x4f, 0x63)) // \377tOc
    be32(2)
    val order = shas.indices.sortBy(i => GitObjects.hex(shas(i)))
    // fanout: cumulative counts by first byte
    val counts = new Array[Int](256)
    shas.foreach(s => counts(s(0) & 0xff) += 1)
    var cum = 0
    (0 until 256).foreach { b => cum += counts(b); be32(cum.toLong) }
    order.foreach(i => out.write(shas(i)))
    order.foreach(i => be32(crcs(i)))
    order.zipWithIndex.foreach { case (i, rank) =>
      val lie = if (lieOffset && rank == 0) 4L else 0L
      be32(offsets(i) + lie) // all gate offsets < 2^31: no 8-byte table
    }
    out.write(packSha)
    val pre = out.toByteArray
    out.write(Sha1.hash(pre, 0, pre.length))
    out.toByteArray
  }

  // ------------------------------------------------------ pack reader

  final case class PackObj(tpe: Int, sha: String, content: Array[Byte],
      wasDelta: Boolean)

  /** Walk pack + idx with every audit ON; None quarantines. */
  def read(pack: Array[Byte], idx: Array[Byte]): Option[Seq[PackObj]] =
    try {
      if (pack.length < 32) throw Malformed
      def be32(b: Array[Byte], p: Int): Long = {
        if (p + 4 > b.length) throw Malformed
        ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
          ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
      }
      if (new String(pack, 0, 4, "US-ASCII") != "PACK") throw Malformed
      if (be32(pack, 4) != 2) throw Malformed
      val count = be32(pack, 8)
      if (count < 0 || count > 1000000) throw Malformed
      // the pack trailer: SHA-1 of everything before it
      val bodyEnd = pack.length - 20
      val want = java.util.Arrays.copyOfRange(pack, bodyEnd, pack.length)
      if (!java.util.Arrays.equals(Sha1.hash(pack, 0, bodyEnd), want))
        throw Malformed
      var p = 12
      val byOffset = scala.collection.mutable.LinkedHashMap[Long, (Int, Array[Byte])]()
      val byShaHex = scala.collection.mutable.HashMap[String, Long]()
      val objs = Seq.newBuilder[PackObj]
      val offsets = new Array[Long](count.toInt)
      val crcs = new Array[Long](count.toInt)
      var i = 0
      while (i < count) {
        val objStart = p
        offsets(i) = objStart.toLong
        var c = pack(p) & 0xff; p += 1
        val tpe = (c >> 4) & 7
        var size = (c & 0x0f).toLong
        var shift = 4
        while ((c & 0x80) != 0) {
          if (p >= bodyEnd || shift > 56) throw Malformed
          c = pack(p) & 0xff; p += 1
          size |= (c & 0x7fL) << shift
          shift += 7
        }
        val (content, wasDelta): (Array[Byte], Boolean) = tpe match {
          case T_COMMIT | T_TREE | T_BLOB | 4 =>
            val (raw, end) = zlibAt(pack, p, bodyEnd)
            p = end
            if (raw.length.toLong != size) throw Malformed
            byOffset(objStart.toLong) = (tpe, raw)
            (raw, false)
          case T_OFS_DELTA =>
            var cc = pack(p) & 0xff; p += 1
            var ofs = (cc & 0x7f).toLong
            while ((cc & 0x80) != 0) {
              if (p >= bodyEnd) throw Malformed
              cc = pack(p) & 0xff; p += 1
              ofs = ((ofs + 1) << 7) | (cc & 0x7f).toLong
            }
            val basePos = objStart - ofs
            val (baseTpe, base) = byOffset.getOrElse(basePos, throw Malformed)
            val (d, end) = zlibAt(pack, p, bodyEnd)
            p = end
            if (d.length.toLong != size) throw Malformed
            val c2 = applyDelta(base, d)
            byOffset(objStart.toLong) = (baseTpe, c2)
            (c2, true)
          case T_REF_DELTA =>
            if (p + 20 > bodyEnd) throw Malformed
            val baseSha = GitObjects.hex(
              java.util.Arrays.copyOfRange(pack, p, p + 20))
            p += 20
            // thin packs (external base) are out of scope: quarantine
            val basePos = byShaHex.getOrElse(baseSha, throw Malformed)
            val (baseTpe, base) = byOffset(basePos)
            val (d, end) = zlibAt(pack, p, bodyEnd)
            p = end
            if (d.length.toLong != size) throw Malformed
            val c2 = applyDelta(base, d)
            byOffset(objStart.toLong) = (baseTpe, c2)
            (c2, true)
          case _ => throw Malformed
        }
        val crc = new java.util.zip.CRC32
        crc.update(pack, objStart, p - objStart)
        crcs(i) = crc.getValue
        val resolvedTpe = byOffset(objStart.toLong)._1
        val sha = GitObjects.hex(GitObjects.objSha(typeName(resolvedTpe),
          content))
        byShaHex(sha) = objStart.toLong
        objs += PackObj(resolvedTpe, sha, content, wasDelta)
        i += 1
      }
      if (p != bodyEnd) throw Malformed // trailing bytes before the trailer
      val result = objs.result()
      auditIdx(idx, result, offsets, crcs, want)
      auditGraph(result)
      Some(result)
    } catch { case _: Throwable => None }

  /** Strict zlib mid-buffer: returns (content, position after the
    * 4-byte Adler). */
  private def zlibAt(b: Array[Byte], start: Int, limit: Int)
      : (Array[Byte], Int) = {
    if (start + 6 > limit) throw Malformed
    val cmf = b(start) & 0xff
    val flg = b(start + 1) & 0xff
    if ((cmf & 0x0f) != 8 || (cmf >> 4) > 7 ||
      (cmf * 256 + flg) % 31 != 0 || (flg & 0x20) != 0) throw Malformed
    val (content, end, _) = DeflateCodec.inflateRaw(b, start + 2, limit)
    if (end + 4 > limit) throw Malformed
    val want = ((b(end) & 0xffL) << 24) | ((b(end + 1) & 0xffL) << 16) |
      ((b(end + 2) & 0xffL) << 8) | (b(end + 3) & 0xffL)
    if (want != DeflateCodec.adler32(content, 0, content.length))
      throw Malformed
    (content, end + 4)
  }

  /** idx v2: fanout consistency, id identity, CRC32 recompute, and
    * the offsets-vs-walk cross-check. */
  private def auditIdx(idx: Array[Byte], objs: Seq[PackObj],
      offsets: Array[Long], crcs: Array[Long],
      packSha: Array[Byte]): Unit = {
    def be32(p: Int): Long = {
      if (p + 4 > idx.length) throw Malformed
      ((idx(p) & 0xffL) << 24) | ((idx(p + 1) & 0xffL) << 16) |
        ((idx(p + 2) & 0xffL) << 8) | (idx(p + 3) & 0xffL)
    }
    if (idx.length < 8 + 1024 + 40 ||
      (idx(0) & 0xff) != 0xff || idx(1) != 0x74 || idx(2) != 0x4f ||
      idx(3) != 0x63 || be32(4) != 2) throw Malformed
    val n = objs.size
    val sorted = objs.zipWithIndex.sortBy(_._1.sha)
    // fanout monotone and consistent with the sorted id table
    var prev = 0L
    (0 until 256).foreach { b =>
      val v = be32(8 + 4 * b)
      if (v < prev) throw Malformed
      val expect = sorted.count(o => (Integer.parseInt(
        o._1.sha.substring(0, 2), 16)) <= b)
      if (v != expect) throw Malformed
      prev = v
    }
    if (prev != n) throw Malformed
    val shaBase = 8 + 1024
    val crcBase = shaBase + 20 * n
    val offBase = crcBase + 4 * n
    if (idx.length != offBase + 4 * n + 40) throw Malformed
    sorted.zipWithIndex.foreach { case ((o, walkIdx), rank) =>
      val shaHex = (0 until 20).map { k =>
        f"${idx(shaBase + 20 * rank + k) & 0xff}%02x"
      }.mkString
      if (shaHex != o.sha) throw Malformed // identity audit
      if (be32(crcBase + 4 * rank) != crcs(walkIdx)) throw Malformed
      val off = be32(offBase + 4 * rank)
      if ((off & 0x80000000L) != 0) throw Malformed // 8-byte table: out of scope
      if (off != offsets(walkIdx)) throw Malformed // the lying-offset audit
    }
    val trailerAt = offBase + 4 * n
    if (!java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(idx, trailerAt, trailerAt + 20), packSha))
      throw Malformed
    val want = java.util.Arrays.copyOfRange(idx, trailerAt + 20,
      trailerAt + 40)
    if (!java.util.Arrays.equals(Sha1.hash(idx, 0, trailerAt + 20), want))
      throw Malformed
  }

  /** Tree/commit linkage: every reference must resolve in-pack, tree
    * entry order canonical. */
  private def auditGraph(objs: Seq[PackObj]): Unit = {
    val byId = objs.map(o => o.sha -> o).toMap
    objs.foreach { o =>
      o.tpe match {
        case T_TREE =>
          var p = 0
          // canonical tree order is git's base_name_compare: raw
          // name bytes compared UNSIGNED, with a directory entry
          // (mode 40000) sorted as name+"/" — so "foo.txt" (blob)
          // precedes "foo" (tree, sorts as "foo/"). A UTF-16 String
          // '<' on bare names gets both the non-ASCII ordering and
          // the dir/prefix-sibling case wrong.
          var prevKey: Array[Byte] = Array.emptyByteArray
          def cmpUnsigned(a: Array[Byte], c: Array[Byte]): Int = {
            val n = math.min(a.length, c.length)
            var i = 0
            while (i < n) {
              val d = (a(i) & 0xFF) - (c(i) & 0xFF)
              if (d != 0) return d
              i += 1
            }
            a.length - c.length
          }
          val b = o.content
          while (p < b.length) {
            val sp = b.indexOf(' '.toByte, p)
            if (sp < 0) throw Malformed
            val nul = b.indexOf(0.toByte, sp)
            if (nul < 0 || nul + 20 > b.length) throw Malformed
            val mode = new String(b, p, sp - p, "US-ASCII")
            val nameBytes = java.util.Arrays.copyOfRange(b, sp + 1, nul)
            val key =
              if (mode == "40000") nameBytes :+ '/'.toByte else nameBytes
            if (cmpUnsigned(key, prevKey) <= 0) throw Malformed // canonical sort
            prevKey = key
            val sha = GitObjects.hex(
              java.util.Arrays.copyOfRange(b, nul + 1, nul + 21))
            val target = byId.getOrElse(sha, throw Malformed) // dangling
            if (target.tpe != T_BLOB && target.tpe != T_TREE) throw Malformed
            p = nul + 21
          }
        case T_COMMIT =>
          val text = new String(o.content, "UTF-8")
          if (!text.startsWith("tree ")) throw Malformed
          val treeSha = text.substring(5, 45)
          val t = byId.getOrElse(treeSha, throw Malformed)
          if (t.tpe != T_TREE) throw Malformed
        case _ =>
      }
    }
  }
}

/** In-plan synthesizer + gate for d142: each doc becomes a packed
  * object graph — blob 0 the full doc text, blobs 1..K-1 deltas
  * against it (odd j OFS_DELTA, even j REF_DELTA — both encodings
  * corpus-wide), a canonical tree listing all K blobs, a commit
  * referencing the tree — written through our pack writer (zlib =
  * d124, ids = d136 SHA-1), then walked back with the trailer /
  * identity / CRC / fanout / offset / linkage audits ON. Damage %7:
  * 0 → truncation; 3 → a LYING IDX OFFSET on one entry (the pack
  * intact — only the offsets-vs-walk cross-check catches it); 5 → a
  * delta whose declared SOURCE SIZE is one too large (zlib and sha
  * fine at the container level — only the strict delta apply catches
  * a delta that lies about its base). Damaged docs contribute
  * nothing (the d111 rule). */
object GitPackSim {
  import GitPack._

  private[graft] def k(docId: Long): Int = (3 + docId % 4).toInt

  private[graft] def revSuffix(docId: Long, j: Int): String =
    s"\nrev $j of $docId"

  private[graft] def entriesFor(docId: Long, text: String,
      lieSrcSize: Boolean): Seq[Entry] = {
    val base = text.getBytes("UTF-8")
    val kk = k(docId)
    val blobs: Seq[Entry] = Full(T_BLOB, base) +: (1 until kk).map { j =>
      val d = deltaCopyPlusInsert(base.length,
        revSuffix(docId, j).getBytes("UTF-8"),
        lieSrcSize = lieSrcSize && j == 1)
      if (j % 2 == 1) OfsDelta(0, d) else RefDelta(0, d)
    }
    blobs
  }

  private[graft] def writtenFor(docId: Long, text: String): Written = {
    val mode = docId % 7
    val entries = entriesFor(docId, text, lieSrcSize = mode == 5)
    val kk = k(docId)
    val base = text.getBytes("UTF-8")
    val blobShas = (0 until kk).map { j =>
      val content =
        if (j == 0) base
        else base ++ revSuffix(docId, j).getBytes("UTF-8")
      GitObjects.objSha("blob", content)
    }
    val treeBytes = GitObjects.tree(
      (0 until kk).map(j => ("100644", s"f$j.txt", blobShas(j))))
    val commitBytes = GitObjects.commit(GitObjects.objSha("tree", treeBytes),
      s"snapshot d$docId")
    val all = entries ++ Seq(Full(T_TREE, treeBytes),
      Full(T_COMMIT, commitBytes))
    write(all, lieIdxOffset = mode == 3)
  }

  private[graft] def damagedFor(docId: Long, text: String)
      : (Array[Byte], Array[Byte]) = {
    val w = writtenFor(docId, text)
    if (docId % 7 == 0)
      (java.util.Arrays.copyOf(w.pack, w.pack.length - 10), w.idx)
    else (w.pack, w.idx)
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_objects", LongType),
    StructField("n_blobs", LongType),
    StructField("n_deltas", LongType),
    StructField("blob_bytes", LongType),
    StructField("tree_bytes", LongType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            val out =
              try {
                val (pack, idx) = damagedFor(id, text)
                GitPack.read(pack, idx).map { objs =>
                  val blobs = objs.filter(_.tpe == GitPack.T_BLOB)
                  val tree = objs.find(_.tpe == GitPack.T_TREE)
                    .getOrElse(throw GitPack.Malformed)
                  Row(id, objs.size.toLong, blobs.size.toLong,
                    objs.count(_.wasDelta).toLong,
                    blobs.map(_.content.length.toLong).sum,
                    tree.content.length.toLong)
                }
              } catch { case _: Throwable => None }
            out.iterator
          }
        }
      }(enc)
  }
}
