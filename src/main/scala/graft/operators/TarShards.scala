package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** USTAR (POSIX tar) shard codec for the d104 gate — the CONTAINER
  * format large-scale training corpora actually ship in: a WebDataset
  * shard is a tar archive whose members group into samples by
  * basename (`000123.txt` + `000123.cls` = one sample), streamed
  * sequentially so a reader never seeks. Unlike the media codecs the
  * payload here is the pipeline's own unit of storage, and the walk
  * must be strict: 512-byte header blocks with an 8-bit checksum over
  * the header (the integrity field the d104 damage slice flips),
  * octal size fields, zero-padded data blocks, the two-zero-block
  * terminator.
  *
  * Scope: USTAR regular files (typeflag '0'/NUL), names ≤ 100 chars,
  * sizes < 8 GiB (12-digit octal). Links/devices/GNU longname
  * extensions quarantine. The decoder reads any conformant in-scope
  * stream — GNU tar's `--format=ustar` output is pinned in
  * MediaDecodePropertySpec, both directions.
  *
  * Reference anchor: same constructor∘decoder pattern as the
  * d89/d98/d101-d103 gates (SURVEY §2.5) carried to the corpus
  * container layer.
  */
object TarCodec {

  /** Bomb bound on the DECLARED total of member sizes. */
  private val MAX_BYTES = 1L << 30

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

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

  private def headerFor(name: String, size: Long): Array[Byte] = {
    val nb = name.getBytes("US-ASCII")
    require(nb.length <= 100, s"name too long: $name")
    val hdr = new Array[Byte](512)
    System.arraycopy(nb, 0, hdr, 0, nb.length)
    writeOctal(hdr, 100, 8, 420) // mode 0644
    writeOctal(hdr, 108, 8, 0) // uid
    writeOctal(hdr, 116, 8, 0) // gid
    writeOctal(hdr, 124, 12, size)
    writeOctal(hdr, 136, 12, 0) // mtime (fixed: deterministic shards)
    hdr(156) = '0' // typeflag: regular file
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, hdr, 257, 5)
    hdr(263) = '0'; hdr(264) = '0' // version "00"
    // checksum: field treated as 8 spaces, stored 6 octal + NUL + ' '
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

  /** Build a USTAR archive of (name, content) members, in order, with
    * the standard two-zero-block terminator. */
  private[graft] def encode(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(members.map(_._2.length + 1024).sum)
    members.foreach { case (name, content) =>
      out.write(headerFor(name, content.length.toLong), 0, 512)
      out.write(content, 0, content.length)
      val rem = content.length % 512
      if (rem != 0) out.write(new Array[Byte](512 - rem), 0, 512 - rem)
    }
    out.write(new Array[Byte](1024), 0, 1024)
    out.toByteArray
  }

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    // leading spaces, octal digits, then NUL/space terminator
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

  /** STRICT walk → members in archive order, or None. Verifies the
    * per-header checksum, USTAR magic, regular-file typeflag, octal
    * field grammar, block padding, and the zero-block terminator. */
  private[graft] def decode(b: Array[Byte]): Option[Seq[(String, Array[Byte])]] = {
    try {
      val out = Seq.newBuilder[(String, Array[Byte])]
      var pos = 0
      var total = 0L
      var done = false
      while (!done) {
        if (pos + 512 > b.length) throw Malformed
        if (b.slice(pos, pos + 512).forall(_ == 0)) {
          // terminator: at least one more zero block, then all-zero
          // 512-aligned padding to EOF (GNU tar pads the archive to
          // its blocking factor — 20 blocks by default — with extra
          // zero blocks after the two-block terminator)
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
          val stored = parseOctal(hdr, 148, 7) // 6 digits + NUL
          // byte 155 (the checksum field's filler) is the ONE header
          // byte excluded from the checksum computation AND not read
          // by the octal parse — left unvalidated, a bit flip there
          // would be invisible (the property caught exactly that).
          // Both our encoder and GNU tar write "%06o NUL SPACE";
          // historical writers use NUL — accept only those two.
          if (hdr(155) != ' ' && hdr(155) != 0) throw Malformed
          java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
          var sum = 0
          var i = 0
          while (i < 512) { sum += hdr(i) & 0xFF; i += 1 }
          if (sum != stored) throw Malformed
          val tf = hdr(156)
          if (tf != '0' && tf != 0) throw Malformed // links etc: scope
          var nameEnd = 0
          while (nameEnd < 100 && hdr(nameEnd) != 0) nameEnd += 1
          if (nameEnd == 0) throw Malformed
          val name = new String(hdr, 0, nameEnd, "US-ASCII")
          val size = parseOctal(hdr, 124, 12)
          total += size
          if (total > MAX_BYTES) throw Malformed
          val dataEnd = pos + 512 + size.toInt
          if (dataEnd > b.length) throw Malformed
          out += name -> java.util.Arrays.copyOfRange(b, pos + 512, dataEnd)
          val rem = size.toInt % 512
          pos = dataEnd + (if (rem == 0) 0 else 512 - rem)
          // padding must be zero (strict: bit rot in padding is
          // corruption even though readers could skip it)
          var j = dataEnd
          while (j < pos) {
            if (j >= b.length || b(j) != 0) throw Malformed
            j += 1
          }
        }
      }
      Some(out.result())
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}

/** Deterministic in-plan WebDataset-shard synthesizer + gate for
  * d104. Each doc becomes a tar shard of K samples, each sample two
  * members sharing a basename — `{key}.txt` (closed-form content
  * bytes) and `{key}.cls` (one label byte) — the WebDataset layout a
  * training loader consumes. The gate walks the shard strictly,
  * groups members by basename, and emits per-shard stats the oracle
  * replays arithmetically: member/sample counts, total data bytes,
  * exact content byte sum. Damage slice on doc_id % 7: 0 → truncated
  * to half, 3 → USTAR magic stomped, 5 → one checksum digit bumped
  * (header intact otherwise — the integrity path tar's checksum
  * exists for). */
object TarSim {

  private[graft] def nSamples(docId: Long): Int = (2 + docId % 5).toInt

  private[graft] def txtLen(docId: Long, i: Int): Int =
    (10 + (docId + i) % 23).toInt

  private[graft] def txtByte(docId: Long, i: Int, j: Int): Int =
    ((docId + i * 13 + j) % 256).toInt

  private[graft] def clsByte(docId: Long, i: Int): Int =
    ('0' + ((docId * 7 + i) % 10)).toInt

  private[graft] def members(docId: Long): Seq[(String, Array[Byte])] =
    (0 until nSamples(docId)).flatMap { i =>
      val key = f"${docId}%08d_$i%02d"
      val txt = new Array[Byte](txtLen(docId, i))
      var j = 0
      while (j < txt.length) { txt(j) = txtByte(docId, i, j).toByte; j += 1 }
      Seq(s"$key.txt" -> txt, s"$key.cls" -> Array(clsByte(docId, i).toByte))
    }

  private[graft] def cleanTar(docId: Long): Array[Byte] =
    TarCodec.encode(members(docId))

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val tar = cleanTar(docId)
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(tar, tar.length / 2)
      case 3 => val d = tar.clone(); d(257) = 'X'; d
      case 5 =>
        // bump one stored checksum digit on the FIRST header: the
        // header stays grammatical, only the checksum verify catches
        // it (tar's integrity field, the PNG CRC-flip analog)
        val d = tar.clone()
        d(151) = (if (d(151) == '7') '6' else (d(151) + 1)).toByte
        d
      case _ => tar
    }
  }

  private val payloadSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  /** doc_id → payload. Map-only, id-driven: parallelizes as the scan
    * does and shuffles nothing at any corpus size. */
  def payloads(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(payloadSchema)
    docs.select(col("doc_id"))
      .mapPartitions(_.map { r =>
        val id = r.getLong(0)
        Row(id, payloadFor(id))
      })(enc)
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_members", LongType),
    StructField("n_samples", LongType),
    StructField("data_bytes", LongType),
    StructField("byte_sum", LongType)))

  val sampleSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_key", StringType),
    StructField("txt_len", LongType),
    StructField("txt_sum", LongType),
    StructField("label", IntegerType)))

  /** Shard → per-SAMPLE rows — the d105 gate and the actual ingest
    * operator a training pipeline runs: each COMPLETE basename group
    * (.txt AND .cls present) becomes one row carrying the extracted
    * text stats and the parsed label, ready for downstream dedup/
    * filter/pack stages. Damaged shards contribute nothing here (the
    * d104 stats gate is where quarantine is audited); map-only
    * flatMap, so ingest parallelism is scan parallelism at any
    * corpus size. */
  def samples(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(sampleSchema)
    withPayloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            TarCodec.decode(r.getAs[Array[Byte]](1)) match {
              case Some(ms) =>
                val txts = new java.util.HashMap[String, Array[Byte]]()
                val clss = new java.util.HashMap[String, Array[Byte]]()
                ms.foreach { case (name, content) =>
                  val dot = name.lastIndexOf('.')
                  if (dot > 0) name.substring(dot + 1) match {
                    case "txt" => txts.put(name.substring(0, dot), content)
                    case "cls" => clss.put(name.substring(0, dot), content)
                    case _ =>
                  }
                }
                val out = Seq.newBuilder[Row]
                txts.forEach { (key, txt) =>
                  val cls = clss.get(key)
                  if (cls != null && cls.length == 1) {
                    var sum = 0L
                    var j = 0
                    while (j < txt.length) { sum += txt(j) & 0xFF; j += 1 }
                    out += Row(id, key, txt.length.toLong, sum,
                      (cls(0) & 0xFF) - '0')
                  }
                }
                out.result()
              case None => Nil
            }
          }
        }
      }(enc)
  }

  /** Batched strict shard walk → per-shard stats with quarantine —
    * the d104 gate, same mapPartitions batch contract as the media
    * gates. `n_samples` counts basename groups carrying BOTH a .txt
    * and a .cls member (the WebDataset completeness rule). */
  def stats(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    withPayloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            TarCodec.decode(r.getAs[Array[Byte]](1)) match {
              case Some(ms) =>
                var dataBytes = 0L; var byteSum = 0L
                val groups = new java.util.HashMap[String, Int]()
                ms.foreach { case (name, content) =>
                  dataBytes += content.length
                  var j = 0
                  while (j < content.length) { byteSum += content(j) & 0xFF; j += 1 }
                  val dot = name.lastIndexOf('.')
                  if (dot > 0) {
                    val key = name.substring(0, dot)
                    val ext = name.substring(dot + 1)
                    val bit = if (ext == "txt") 1 else if (ext == "cls") 2 else 0
                    if (bit != 0)
                      groups.merge(key, bit, (a, b) => Integer.valueOf(a | b))
                  }
                }
                var samples = 0L
                groups.values.forEach(v => if (v == 3) samples += 1)
                Row(id, "ok", ms.length.toLong, samples, dataBytes, byteSum)
              case None =>
                Row(id, "quarantined", null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
