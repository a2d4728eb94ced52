package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PAX-extended tar (POSIX.1-2001 pax interchange format) + GNU
  * longlinks — the headers REAL corpus shards hit the moment a path
  * passes 100 bytes or a member passes 8 GiB (the USTAR octal
  * ceiling). d104's walker covers the plain-USTAR WebDataset layout;
  * this one adds, from the published formats, BOTH directions:
  *
  *  - typeflag 'x' EXTENDED HEADERS: the record grammar
  *    `"%d %s=%s\n"` where the leading decimal is the TOTAL record
  *    length including itself — enforced exactly (digits, one space,
  *    a non-empty '='-free key, the value, the mandatory trailing
  *    newline, records tiling the data; a record whose length lies
  *    QUARANTINES); `path` overrides the next member's name, `size`
  *    its size (decimal, bomb-bounded); duplicate keys take the LAST
  *    value (POSIX: "the last value prevails"); other standard keys
  *    (mtime/atime/ctime/uid/gid/comment, GNU's sub-second stamps)
  *    are framing-validated and ignored; unknown keys are ignored per
  *    the spec's forward-compat rule;
  *  - typeflag 'g' GLOBAL headers: records parsed with the same
  *    grammar; a `path`/`size` in a global header is out of scope and
  *    quarantines (never guessed);
  *  - typeflag 'L' GNU LONGLINK: the data IS the next member's name,
  *    NUL-terminated;
  *  - the PAIRING rules: an override must be followed by a regular
  *    member (a dangling 'x'/'L' at the terminator quarantines), and
  *    stacking two name overrides quarantines.
  *
  * The encoder emits PAX 'x' headers (path + mtime records) for any
  * name over 100 bytes. Interop pinned BOTH directions against GNU
  * tar (the d104 precedent): `tar --format=pax` and `--format=gnu`
  * archives with >100-byte paths walk through this decoder
  * name-and-byte-identical, and our PAX shards list and extract
  * through the real `tar` with full long names (TarPaxSpec).
  */
object TarPaxCodec {

  private val MAX_BYTES = 1L << 30

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ------------------------------------------------------------ shared

  private def writeOctal(hdr: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= len - 1, s"octal overflow $v in $len")
    val pad = len - 1 - s.length
    var i = 0
    while (i < pad) { hdr(off + i) = '0'; i += 1 }
    i = 0
    while (i < s.length) { hdr(off + pad + i) = s.charAt(i).toByte; i += 1 }
    hdr(off + len - 1) = 0
  }

  private def headerFor(name: String, size: Long, typeflag: Byte): Array[Byte] = {
    val nb = name.getBytes("US-ASCII")
    require(nb.length <= 100, s"name too long: $name")
    val hdr = new Array[Byte](512)
    System.arraycopy(nb, 0, hdr, 0, nb.length)
    writeOctal(hdr, 100, 8, 420)
    writeOctal(hdr, 108, 8, 0)
    writeOctal(hdr, 116, 8, 0)
    writeOctal(hdr, 124, 12, size)
    writeOctal(hdr, 136, 12, 0)
    hdr(156) = typeflag
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, hdr, 257, 5)
    hdr(263) = '0'; hdr(264) = '0'
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    var sum = 0
    var i = 0
    while (i < 512) { sum += hdr(i) & 0xFF; i += 1 }
    val cs = Integer.toOctalString(sum)
    val pad = 6 - cs.length
    i = 0
    while (i < pad) { hdr(148 + i) = '0'; i += 1 }
    i = 0
    while (i < cs.length) { hdr(148 + pad + i) = cs.charAt(i).toByte; i += 1 }
    hdr(154) = 0; hdr(155) = ' '
    hdr
  }

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end && b(i) == ' ') i += 1
    var sawDigit = false
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0'); i += 1; sawDigit = true
      if (v > MAX_BYTES) throw Malformed
    }
    while (i < end && (b(i) == 0 || b(i) == ' ')) i += 1
    if (!sawDigit || i != end) throw Malformed
    v
  }

  // ------------------------------------------------------- pax records

  /** One PAX record: `"%d %s=%s\n"` with the length EXACT. Values are
    * raw bytes (GNU writes sub-second mtimes); keys are ASCII. */
  private[graft] def parseRecords(data: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, Array[Byte])]
    var p = 0
    while (p < data.length) {
      val recStart = p
      var l = 0L
      var digits = 0
      while (p < data.length && data(p) >= '0' && data(p) <= '9') {
        l = l * 10 + (data(p) - '0')
        if (l > data.length) throw Malformed
        p += 1; digits += 1
      }
      if (digits == 0 || p >= data.length || data(p) != ' ') throw Malformed
      p += 1
      val recEnd = recStart + l.toInt
      if (l < digits + 3 || recEnd > data.length) throw Malformed
      var keyEnd = p
      while (keyEnd < recEnd - 1 && data(keyEnd) != '=') keyEnd += 1
      if (keyEnd == p || data(keyEnd) != '=') throw Malformed
      val key = new String(data, p, keyEnd - p, "US-ASCII")
      if (key.exists(c => c < ' ' || c > '~')) throw Malformed
      if (data(recEnd - 1) != '\n') throw Malformed // the length lies
      out += key -> java.util.Arrays.copyOfRange(data, keyEnd + 1, recEnd - 1)
      p = recEnd
    }
    out.result()
  }

  private def renderRecord(key: String, value: String): Array[Byte] = {
    val body = s" $key=$value\n".getBytes("UTF-8")
    // the length prefix counts itself: solve for the fixed point
    var l = body.length + 1
    while (l.toString.length + body.length != l) l += 1
    (l.toString.getBytes("US-ASCII") ++ body)
  }

  // ------------------------------------------------------------ encode

  /** Archive with PAX 'x' headers for names over 100 bytes. The
    * `danglingTail` flag plants the %7==5 damage: a well-formed 'x'
    * header with nothing after it but the terminator. */
  private[graft] def encode(members: Seq[(String, Array[Byte])],
      danglingTail: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def writePadded(data: Array[Byte]): Unit = {
      out.write(data, 0, data.length)
      val rem = data.length % 512
      if (rem != 0) out.write(new Array[Byte](512 - rem), 0, 512 - rem)
    }
    members.zipWithIndex.foreach { case ((name, content), i) =>
      val nb = name.getBytes("US-ASCII")
      if (nb.length > 100) {
        val records = renderRecord("path", name) ++
          renderRecord("mtime", "1700000000")
        out.write(headerFor(s"PaxHeaders/m$i", records.length.toLong, 'x'),
          0, 512)
        writePadded(records)
        out.write(headerFor(new String(nb, 0, 100, "US-ASCII"),
          content.length.toLong, '0'), 0, 512)
      } else {
        out.write(headerFor(name, content.length.toLong, '0'), 0, 512)
      }
      writePadded(content)
    }
    if (danglingTail) {
      val records = renderRecord("path", "orphan/never-applied")
      out.write(headerFor("PaxHeaders/orphan", records.length.toLong, 'x'),
        0, 512)
      writePadded(records)
    }
    out.write(new Array[Byte](1024), 0, 1024)
    out.toByteArray
  }

  // ------------------------------------------------------------ decode

  /** STRICT walk with the PAX/GNU override layer → members. */
  private[graft] def decode(b: Array[Byte]): Option[Seq[(String, Array[Byte])]] =
    try {
      val out = Seq.newBuilder[(String, Array[Byte])]
      var pos = 0
      var total = 0L
      var pendingPath: String = null
      var pendingSize = -1L
      var done = false
      while (!done) {
        if (pos + 512 > b.length) throw Malformed
        if (b.slice(pos, pos + 512).forall(_ == 0)) {
          if (pendingPath != null || pendingSize >= 0)
            throw Malformed // a dangling override: nothing to apply to
          if (pos + 1024 > b.length || (b.length - pos) % 512 != 0)
            throw Malformed
          var j = pos + 512
          while (j < b.length) {
            if (b(j) != 0) throw Malformed
            j += 1
          }
          done = true
        } else {
          val hdr = java.util.Arrays.copyOfRange(b, pos, pos + 512)
          if (!(hdr(257) == 'u' && hdr(258) == 's' && hdr(259) == 't' &&
            hdr(260) == 'a' && hdr(261) == 'r')) throw Malformed
          val stored = parseOctal(hdr, 148, 7)
          if (hdr(155) != ' ' && hdr(155) != 0) throw Malformed
          java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
          var sum = 0
          var i = 0
          while (i < 512) { sum += hdr(i) & 0xFF; i += 1 }
          if (sum != stored) throw Malformed
          val tf = hdr(156)
          var nameEnd = 0
          while (nameEnd < 100 && hdr(nameEnd) != 0) nameEnd += 1
          if (nameEnd == 0) throw Malformed
          val hdrName = new String(hdr, 0, nameEnd, "US-ASCII")
          val octSize = parseOctal(hdr, 124, 12)
          val dataEnd = pos + 512 + octSize.toInt
          total += octSize
          if (total > MAX_BYTES || dataEnd > b.length) throw Malformed
          val data = java.util.Arrays.copyOfRange(b, pos + 512, dataEnd)
          val rem = octSize.toInt % 512
          val next = dataEnd + (if (rem == 0) 0 else 512 - rem)
          var j = dataEnd
          while (j < next) {
            if (j >= b.length || b(j) != 0) throw Malformed
            j += 1
          }
          tf match {
            case 'x' =>
              if (pendingPath != null || pendingSize >= 0) throw Malformed
              parseRecords(data).foreach { case (k, v) =>
                k match {
                  case "path" =>
                    val s = CharsetSniff.decodeUtf8(v, 0, v.length)
                    if (s.isEmpty) throw Malformed
                    pendingPath = s // duplicates: the last value prevails
                  case "size" =>
                    val s = new String(v, "US-ASCII")
                    if (s.isEmpty || !s.forall(_.isDigit)) throw Malformed
                    val sz = java.lang.Long.parseLong(s)
                    if (sz > MAX_BYTES) throw Malformed
                    pendingSize = sz
                  case _ => // mtime/atime/uid/…/unknown: framing-checked, ignored
                }
              }
            case 'g' =>
              parseRecords(data).foreach { case (k, _) =>
                // per-member overrides in a GLOBAL header: out of scope
                if (k == "path" || k == "size") throw Malformed
              }
            case 'L' =>
              if (pendingPath != null) throw Malformed // stacked overrides
              var end = data.length
              while (end > 0 && data(end - 1) == 0) end -= 1
              if (end == 0 || end < data.length - 1) throw Malformed
              pendingPath = CharsetSniff.decodeUtf8(data, 0, end)
            case '0' | 0 =>
              val name = if (pendingPath != null) pendingPath else hdrName
              val size = if (pendingSize >= 0) pendingSize else octSize
              // a pax size override must agree with the data present
              if (size != data.length) throw Malformed
              out += name -> data
              pendingPath = null
              pendingSize = -1L
            case _ => throw Malformed // links/devices: out of scope
          }
          pos = next
        }
      }
      Some(out.result())
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: Throwable => None
    }
}

/** In-plan synthesizer + gate for d144: each doc is a shard of
  * K = 2 + doc_id%4 members where EVEN members carry >100-byte paths
  * (forcing a PAX 'x' header each — path + mtime records) and odd
  * members stay plain USTAR; contents are closed-form repeats. Damage
  * %7: 0 → truncation; 3 → a LYING PAX RECORD LENGTH (the first
  * record's decimal bumped — every other byte intact, only the
  * record grammar catches it); 5 → a DANGLING 'x' header before the
  * terminator (well-formed in itself — only the pairing rule catches
  * an override with nothing to apply to). */
object TarPaxSim {

  private[graft] def k(docId: Long): Int = (2 + docId % 4).toInt

  private[graft] def nameFor(docId: Long, i: Int): String =
    if (i % 2 == 0)
      "sample/" + (s"sub${docId % 10}/" * 6) + s"f$i-" +
        ("x" * (80 + ((docId + i) % 20).toInt)) + ".txt"
    else s"s/f$i.txt"

  private[graft] def contentFor(docId: Long, i: Int): Array[Byte] =
    (s"member $i of $docId payload;" * (1 + (docId % 3).toInt))
      .getBytes("US-ASCII")

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val mode = docId % 7
    val members = (0 until k(docId))
      .map(i => (nameFor(docId, i), contentFor(docId, i)))
    val clean = TarPaxCodec.encode(members, danglingTail = mode == 5)
    mode match {
      case 0 => java.util.Arrays.copyOf(clean, clean.length / 2)
      case 3 =>
        // the first 'x' header's data begins at offset 512 (member 0
        // is always long-named); its record length digits start there
        val d = clean.clone()
        d(512) = (d(512) + 1).toByte
        d
      case _ => clean
    }
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_members", LongType),
    StructField("n_long", LongType),
    StructField("name_chars", LongType),
    StructField("total_bytes", LongType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            TarPaxCodec.decode(payloadFor(id)) match {
              case Some(members) =>
                Iterator.single(Row(id, members.size.toLong,
                  members.count(_._1.length > 100).toLong,
                  members.map(_._1.length.toLong).sum,
                  members.map(_._2.length.toLong).sum))
              case None => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
