package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ZIP (PKWARE APPNOTE) reader for the d113 gate — the remaining
  * everyday shipping container next to tar (d104), gzip (d106) and
  * zip's streaming cousins: a zip is random-access BY DESIGN — the
  * authoritative structure is the CENTRAL DIRECTORY at the END of the
  * file, so a real reader walks EOCD → central directory → local
  * headers, which is exactly what this decoder does (the
  * stream-of-local-headers shortcut cannot even see entries that were
  * superseded or voided). Entry bodies are STORED (method 0) or raw
  * DEFLATE (method 8, JDK Inflater); CRC-32 and both sizes are
  * verified per entry against the central directory, and the local
  * header must AGREE with its central entry (same name, method, crc,
  * sizes) — a zip that disagrees with itself is corrupt.
  *
  * Scope (the d98 discipline): single-disk, no zip64, no encryption,
  * empty archive comment, methods {0, 8} — anything else QUARANTINES
  * rather than crashes. Data descriptors (flag bit 3 — how
  * java.util.zip's ZipOutputStream writes every DEFLATED entry: local
  * crc/sizes zeroed, real values streamed AFTER the data) are IN
  * scope since r12: the local header must carry zeros, the descriptor
  * (with or without the PK\x07\x08 signature) is located via the
  * central directory's compressed size and verified field-for-field
  * against the central entry — the post-hoc cross-structure check an
  * end-anchored reader can always make. Descriptors on STORED entries
  * stay out of scope (no real writer emits them; the data end would
  * be self-referential for a corrupt central size). All declared
  * offsets/sizes are bounds-checked before use.
  *
  * Reference anchor: same constructor∘decoder discipline as the
  * d89-d112 gates (SURVEY §2.5); interop pinned BOTH directions
  * against java.util.zip (ZipOutputStream-written archives decode in
  * our walker; ZipInputStream reads our encoder's output byte-exact).
  */
object ZipCodec {

  private val MAX_BYTES = 1L << 30

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private[graft] final case class Entry(name: String, method: Int,
                                        content: Array[Byte])

  private def crc32(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32
    c.update(b)
    c.getValue
  }

  private def deflateRaw(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream(b.length / 2 + 32)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Encode entries as a conformant archive: local headers + data,
    * central directory, EOCD. Fixed DOS timestamp (deterministic).
    * With `streamedDeflate` set, DEFLATED entries use data-descriptor
    * framing (flag bit 3, zeroed local fields, signed descriptor after
    * the data) — byte-for-byte the shape java.util.zip's
    * ZipOutputStream writes. */
  private[graft] def encode(entries: Seq[Entry],
                            streamedDeflate: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Long): Unit = { w16((v & 0xFFFF).toInt); w16(((v >> 16) & 0xFFFF).toInt) }
    val locals = entries.map { e =>
      val off = out.size()
      val nameB = e.name.getBytes("US-ASCII")
      val data = if (e.method == 8) deflateRaw(e.content) else e.content
      val streamed = streamedDeflate && e.method == 8
      out.write(Array[Byte]('P', 'K', 3, 4))
      w16(20); w16(if (streamed) 0x08 else 0); w16(e.method)
      w16(0x6020); w16(0x5A41) // fixed DOS time/date: 2025-02-01 12:01:00
      if (streamed) { w32(0L); w32(0L); w32(0L) } // real values follow the data
      else {
        w32(crc32(e.content)); w32(data.length.toLong); w32(e.content.length.toLong)
      }
      w16(nameB.length); w16(0)
      out.write(nameB, 0, nameB.length)
      out.write(data, 0, data.length)
      if (streamed) {
        out.write(Array[Byte]('P', 'K', 7, 8))
        w32(crc32(e.content)); w32(data.length.toLong); w32(e.content.length.toLong)
      }
      (e, off, data.length, nameB, streamed)
    }
    val cdOff = out.size()
    locals.foreach { case (e, off, csize, nameB, streamed) =>
      out.write(Array[Byte]('P', 'K', 1, 2))
      w16(20); w16(20); w16(if (streamed) 0x08 else 0); w16(e.method)
      w16(0x6020); w16(0x5A41)
      w32(crc32(e.content)); w32(csize.toLong); w32(e.content.length.toLong)
      w16(nameB.length); w16(0); w16(0)
      w16(0); w16(0); w32(0)
      w32(off.toLong)
      out.write(nameB, 0, nameB.length)
    }
    val cdSize = out.size() - cdOff
    out.write(Array[Byte]('P', 'K', 5, 6))
    w16(0); w16(0); w16(entries.length); w16(entries.length)
    w32(cdSize.toLong); w32(cdOff.toLong); w16(0)
    out.toByteArray
  }

  /** STRICT decode via EOCD → central directory → local headers, or
    * None for anything malformed or out of scope. */
  private[graft] def decode(b: Array[Byte]): Option[Seq[Entry]] = {
    def u16(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    def u32(i: Int): Long = (u16(i).toLong) | (u16(i + 2).toLong << 16)
    def sig(i: Int, c: Int, d: Int): Boolean =
      b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == c && b(i + 3) == d
    try {
      // empty comment scope: EOCD is the last 22 bytes, exactly
      if (b.length < 22) return None
      val eo = b.length - 22
      if (!sig(eo, 5, 6)) throw Malformed
      if (u16(eo + 4) != 0 || u16(eo + 6) != 0) throw Malformed // single disk
      val n = u16(eo + 8)
      if (u16(eo + 10) != n) throw Malformed
      val cdSize = u32(eo + 12); val cdOff = u32(eo + 16)
      if (u16(eo + 20) != 0) throw Malformed // comment
      if (cdOff + cdSize != eo.toLong) throw Malformed
      val out = Seq.newBuilder[Entry]
      var p = cdOff.toInt
      var total = 0L
      var i = 0
      while (i < n) {
        if (p + 46 > eo || !sig(p, 1, 2)) throw Malformed
        val flags = u16(p + 8)
        val method = u16(p + 10)
        if ((flags & 0x01) != 0) throw Malformed // encryption
        if (method != 0 && method != 8) throw Malformed
        val streamed = (flags & 0x08) != 0
        if (streamed && method != 0x08) throw Malformed // descriptor needs a self-terminating body
        val crc = u32(p + 16)
        val csize = u32(p + 20); val usize = u32(p + 24)
        val nameLen = u16(p + 28); val extraLen = u16(p + 30)
        val cmtLen = u16(p + 32)
        val lOff = u32(p + 42)
        if (usize > MAX_BYTES || csize > MAX_BYTES) throw Malformed
        if (p + 46 + nameLen + extraLen + cmtLen > eo) throw Malformed
        val name = new String(b, p + 46, nameLen, "US-ASCII")
        // local header must AGREE with the central entry
        val lh = lOff.toInt
        if (lOff + 30 + nameLen > cdOff || !sig(lh, 3, 4)) throw Malformed
        if ((u16(lh + 6) & 0x01) != 0 || u16(lh + 8) != method) throw Malformed
        if (((u16(lh + 6) & 0x08) != 0) != streamed) throw Malformed
        // ZIP64 (APPNOTE 4.5.3): a local header may carry 0xFFFFFFFF
        // size sentinels with the truth in the 0x0001 extra block —
        // numpy's savez writes exactly this shape for every member.
        // The extra region must TILE in (id, size, data) blocks, and
        // the local zip64 block must carry BOTH sizes (usize then
        // csize, the mandated order). Legal local zip64 payloads are
        // sizes-only (16), +offset (24), or +offset+disk (28) — a
        // length that strands trailing bytes inside the block lies
        // about its own tiling and is quarantined.
        def le64(i: Int): Long = u32(i) | (u32(i + 4) << 32)
        def localZip64(): (Long, Long) = {
          val exStart = lh + 30 + nameLen
          val exLen = u16(lh + 28)
          if (exStart + exLen > cdOff) throw Malformed
          var q = exStart
          var found: (Long, Long) = null
          while (q < exStart + exLen) {
            if (q + 4 > exStart + exLen) throw Malformed
            val id = u16(q)
            val sz = u16(q + 2)
            if (q + 4 + sz > exStart + exLen) throw Malformed
            if (id == 0x0001) {
              if ((sz != 16 && sz != 24 && sz != 28) || found != null)
                throw Malformed
              found = (le64(q + 4), le64(q + 12)) // usize, csize
            }
            q += 4 + sz
          }
          if (found == null) throw Malformed // sentinel with no truth
          found
        }
        val lCrc = u32(lh + 14)
        val lCsizeRaw = u32(lh + 18)
        val lUsizeRaw = u32(lh + 22)
        val sentinel =
          lCsizeRaw == 0xFFFFFFFFL && lUsizeRaw == 0xFFFFFFFFL
        val (lUsize, lCsize) =
          if (lCsizeRaw == 0xFFFFFFFFL || lUsizeRaw == 0xFFFFFFFFL) {
            // a lone sentinel (one field 0xFFFFFFFF, the other not)
            // is malformed in every writer we accept
            if (!sentinel) throw Malformed
            if (streamed) (0L, 0L) // resolved below via the descriptor
            else localZip64()
          } else (lUsizeRaw, lCsizeRaw)
        if (streamed) {
          // streamed shape: the local fields are ZEROS by definition
          // (APPNOTE 4.4.9) — except a zip64 streamed writer puts the
          // 0xFFFFFFFF sentinel pair there with the truth deferred to
          // the (8-byte-field) descriptor; both shapes are spec-legal
          // and large streamed writers emit the latter. Either way
          // crc must be zero and the descriptor below is the truth.
          if (lCrc != 0) throw Malformed
          if (!sentinel && (lCsizeRaw != 0 || lUsizeRaw != 0))
            throw Malformed
        } else if (lCrc != crc || lCsize != csize || lUsize != usize)
          throw Malformed
        if (u16(lh + 26) != nameLen) throw Malformed
        if (new String(b, lh + 30, nameLen, "US-ASCII") != name) throw Malformed
        val dataAt = lh + 30 + nameLen + u16(lh + 28)
        if (dataAt.toLong + csize > cdOff) throw Malformed
        if (streamed) {
          // data descriptor (with or without the PK\x07\x08 signature):
          // crc + csize + usize, each verified against the central
          // entry. The signature is OPTIONAL in the spec, so a bare
          // descriptor whose crc equals the signature value is
          // ambiguous — verify BOTH framings and accept either that
          // agrees with the central directory in full. When the local
          // header carried the zip64 sentinel pair, the descriptor's
          // size fields are 8 bytes each (APPNOTE 4.3.9.2).
          val de = dataAt + csize.toInt
          def descOk(dd: Int): Boolean =
            if (sentinel)
              dd.toLong + 20 <= cdOff && u32(dd) == crc &&
                le64(dd + 4) == csize && le64(dd + 12) == usize
            else
              dd.toLong + 12 <= cdOff && u32(dd) == crc &&
                u32(dd + 4) == csize && u32(dd + 8) == usize
          val signedOk = de + 4 <= cdOff && sig(de, 7, 8) && descOk(de + 4)
          if (!signedOk && !descOk(de)) throw Malformed
        }
        val raw = java.util.Arrays.copyOfRange(b, dataAt, dataAt + csize.toInt)
        val content = if (method == 0) {
          if (csize != usize) throw Malformed
          raw
        } else {
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(raw)
          val bos = new java.io.ByteArrayOutputStream(usize.toInt.max(16))
          val buf = new Array[Byte](8192)
          try {
            while (!inf.finished()) {
              val k = inf.inflate(buf)
              if (k == 0 && !inf.finished()) throw Malformed
              bos.write(buf, 0, k)
              if (bos.size() > usize) throw Malformed
            }
            if (inf.getRemaining != 0) throw Malformed // trailing garbage
          } catch {
            case _: java.util.zip.DataFormatException => throw Malformed
          } finally inf.end()
          bos.toByteArray
        }
        if (content.length.toLong != usize || crc32(content) != crc)
          throw Malformed
        total += usize
        if (total > MAX_BYTES) throw Malformed
        out += Entry(name, method, content)
        p += 46 + nameLen + extraLen + cmtLen
        i += 1
      }
      if (p != eo) throw Malformed // directory must consume its span
      Some(out.result())
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}

/** d113 gate — the corpus's REAL text through the zip container:
  * every doc becomes an archive of K = 2 + doc_id%3 entries whose
  * contents are the d111 codepoint slices of the text, alternating
  * STORED and DEFLATED methods (entry i uses method 8 when i is odd —
  * both body paths exercised in one archive); the strict EOCD →
  * central directory → local header walk verifies CRC-32, both sizes,
  * and local/central self-agreement, then the round-trip verdict
  * compares the concatenated entry bodies against the source text.
  * Damage slice on doc_id%7: 0 → truncated (EOCD torn — the
  * interrupted-write shape for an end-anchored format), 3 → one local
  * header signature stomped (central directory intact: only the
  * cross-structure consistency walk catches it), 5 → one bit flipped
  * in entry 0's CENTRAL crc (the integrity field; both copies verify,
  * damage one). */
object ZipSim {

  private[graft] def nEntries(docId: Long): Int = (2 + docId % 3).toInt

  private[graft] def entryTexts(docId: Long, text: String): Seq[String] = {
    val k = nEntries(docId)
    val cps = text.codePointCount(0, text.length)
    (0 until k).map { i =>
      val a = text.offsetByCodePoints(0, (i.toLong * cps / k).toInt)
      val b = text.offsetByCodePoints(0, ((i + 1).toLong * cps / k).toInt)
      text.substring(a, b)
    }
  }

  private[graft] def entriesFor(docId: Long, text: String): Seq[ZipCodec.Entry] =
    entryTexts(docId, text).zipWithIndex.map { case (t, i) =>
      ZipCodec.Entry(f"$docId%08d_$i%02d.txt", if (i % 2 == 1) 8 else 0,
        t.getBytes("UTF-8"))
    }

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    // DEFLATED entries use data-descriptor framing since r12 — the
    // exact shape java.util.zip writes — so the gate exercises the
    // post-hoc descriptor-vs-central verification on every archive
    val clean = ZipCodec.encode(entriesFor(docId, text), streamedDeflate = true)
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(clean, clean.length - 9)
      case 3 =>
        // first local header signature: at offset 0 by construction
        val d = clean.clone(); d(2) = 9; d
      case 5 =>
        // entry 0's crc in the CENTRAL directory (offset cdOff+16);
        // cdOff is in the EOCD at (len-22)+16
        val d = clean.clone()
        val eo = d.length - 22
        val cdOff = ((d(eo + 16) & 0xFFL) | ((d(eo + 17) & 0xFFL) << 8) |
          ((d(eo + 18) & 0xFFL) << 16) | ((d(eo + 19) & 0xFFL) << 24)).toInt
        d(cdOff + 16) = (d(cdOff + 16) ^ 0x01).toByte
        d
      case _ => clean
    }
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_entries", LongType),
    StructField("n_deflated", LongType),
    StructField("data_bytes", LongType),
    StructField("roundtrip_ok", BooleanType)))

  /** Batched strict decode → per-archive stats with quarantine — the
    * d113 gate, same mapPartitions batch contract as the other codec
    * gates (map-only over the scan; the payload is synthesized per
    * row from the real text column). */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            ZipCodec.decode(payloadFor(id, text)) match {
              case Some(es) =>
                val joined = new String(
                  es.map(e => new String(e.content, "UTF-8")).mkString)
                Row(id, "ok", es.length.toLong,
                  es.count(_.method == 8).toLong,
                  es.map(_.content.length.toLong).sum,
                  java.lang.Boolean.valueOf(joined == text))
              case None =>
                Row(id, "quarantined", null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
