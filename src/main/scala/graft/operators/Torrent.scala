package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BitTorrent metainfo (.torrent) — how the big public corpora are
  * actually distributed (Academic Torrents hosts The Pile, LAION and
  * friends; a corpus ingest that starts from a tracker starts here) —
  * from the published BEP-3 specification, BOTH directions:
  *
  *  - BENCODE with the CANONICAL grammar enforced: `i<int>e` with no
  *    leading zeros and no `-0`, `<len>:<bytes>` strings, lists,
  *    and dicts whose keys MUST be strictly sorted byte strings —
  *    the rule exists because the INFOHASH is the SHA-1 of the
  *    bencoded info dict, and an unsorted dict breaks infohash
  *    reproducibility (two "equal" torrents with different ids);
  *    unsorted or duplicate keys QUARANTINE;
  *  - the metainfo shape (single-file mode): `announce`, and `info`
  *    with `name`, `piece length` (> 0), `length` (≥ 0), and
  *    `pieces` — the concatenated 20-byte SHA-1s whose count must
  *    equal ceil(length / piece length) exactly (a pieces string
  *    that disagrees with the length quarantines);
  *  - THE CONTENT-ADDRESSING AUDIT: given the payload, every piece's
  *    SHA-1 (d136's FIPS-180 implementation) is RECOMPUTED against
  *    the pieces list — a lying piece hash is a poisoned shard served
  *    under a healthy name, the exact attack content addressing
  *    exists to stop — and the INFOHASH is recomputed over the
  *    re-bencoded info dict (the identity a tracker swarms on).
  *
  * No bencode implementation exists in this container (stated
  * honestly): pinned by encode∘decode identity, the canonical-grammar
  * rejection grid, the full truncation sweep, and SHA-1's existing
  * MessageDigest pin (CdxSpec).
  */
object Bencode {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  sealed trait B
  final case class BInt(v: Long) extends B
  final case class BStr(v: Array[Byte]) extends B {
    override def equals(o: Any): Boolean = o match {
      case BStr(w) => java.util.Arrays.equals(v, w)
      case _ => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(v)
  }
  final case class BList(items: Seq[B]) extends B
  final case class BDict(items: Seq[(String, B)]) extends B

  /** Strict parse of exactly one value covering the whole buffer. */
  def decode(b: Array[Byte]): Option[B] =
    try {
      val pr = Array(0)
      val v = value(b, pr)
      if (pr(0) != b.length) throw Malformed
      Some(v)
    } catch {
      case Malformed => None
      case _: Throwable => None
    }

  private def value(b: Array[Byte], pr: Array[Int]): B = {
    if (pr(0) >= b.length) throw Malformed
    b(pr(0)) match {
      case 'i' =>
        pr(0) += 1
        val start = pr(0)
        if (pr(0) < b.length && b(pr(0)) == '-') pr(0) += 1
        val digits0 = pr(0)
        while (pr(0) < b.length && b(pr(0)) >= '0' && b(pr(0)) <= '9') pr(0) += 1
        if (pr(0) == digits0 || pr(0) >= b.length || b(pr(0)) != 'e')
          throw Malformed
        val s = new String(b, start, pr(0) - start, "US-ASCII")
        // canonical: no leading zeros, no -0
        if (s == "-0" || (s.length > 1 && s(0) == '0') ||
          (s.length > 2 && s.startsWith("-0"))) throw Malformed
        pr(0) += 1
        BInt(java.lang.Long.parseLong(s))
      case c if c >= '0' && c <= '9' =>
        val start = pr(0)
        while (pr(0) < b.length && b(pr(0)) >= '0' && b(pr(0)) <= '9') pr(0) += 1
        val lenStr = new String(b, start, pr(0) - start, "US-ASCII")
        if (lenStr.length > 1 && lenStr(0) == '0') throw Malformed
        if (pr(0) >= b.length || b(pr(0)) != ':') throw Malformed
        pr(0) += 1
        val len = java.lang.Long.parseLong(lenStr)
        if (len < 0 || len > (1L << 26) ||
          pr(0) + len > b.length) throw Malformed
        val out = java.util.Arrays.copyOfRange(b, pr(0), pr(0) + len.toInt)
        pr(0) += len.toInt
        BStr(out)
      case 'l' =>
        pr(0) += 1
        val items = Seq.newBuilder[B]
        while (pr(0) < b.length && b(pr(0)) != 'e') items += value(b, pr)
        if (pr(0) >= b.length) throw Malformed
        pr(0) += 1
        BList(items.result())
      case 'd' =>
        pr(0) += 1
        val items = Seq.newBuilder[(String, B)]
        var prev: Array[Byte] = null
        while (pr(0) < b.length && b(pr(0)) != 'e') {
          val k = value(b, pr) match {
            case BStr(kb) => kb
            case _ => throw Malformed // keys must be strings
          }
          // the canonical rule: strictly sorted byte strings
          if (prev != null && compareBytes(prev, k) >= 0) throw Malformed
          prev = k
          items += ((new String(k, "UTF-8"), value(b, pr)))
        }
        if (pr(0) >= b.length) throw Malformed
        pr(0) += 1
        BDict(items.result())
      case _ => throw Malformed
    }
  }

  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** Canonical encode (keys re-sorted defensively on write). */
  def encode(v: B): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def emit(x: B): Unit = x match {
      case BInt(n) => out.write(s"i${n}e".getBytes("US-ASCII"))
      case BStr(s) =>
        out.write(s"${s.length}:".getBytes("US-ASCII"))
        out.write(s, 0, s.length)
      case BList(items) =>
        out.write('l'); items.foreach(emit); out.write('e')
      case BDict(items) =>
        out.write('d')
        items.sortWith((a, b2) => compareBytes(
          a._1.getBytes("UTF-8"), b2._1.getBytes("UTF-8")) < 0)
          .foreach { case (k, w) =>
            emit(BStr(k.getBytes("UTF-8"))); emit(w)
          }
        out.write('e')
    }
    emit(v)
    out.toByteArray
  }
}

/** The metainfo layer with the piece-hash audit. */
object TorrentMeta {
  import Bencode._

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  final case class Meta(announce: String, name: String, pieceLen: Long,
      length: Long, nPieces: Int, infoHash: Array[Byte])

  /** Parse + VERIFY against the payload; None quarantines. */
  def verify(metainfo: Array[Byte], payload: Array[Byte]): Option[Meta] =
    try {
      val root = Bencode.decode(metainfo).getOrElse(throw Malformed) match {
        case BDict(items) => items.toMap
        case _ => throw Malformed
      }
      val announce = root.getOrElse("announce", throw Malformed) match {
        case BStr(s) => new String(s, "UTF-8")
        case _ => throw Malformed
      }
      val info = root.getOrElse("info", throw Malformed) match {
        case d: BDict => d
        case _ => throw Malformed
      }
      val im = info.items.toMap
      val name = im.getOrElse("name", throw Malformed) match {
        case BStr(s) => new String(s, "UTF-8")
        case _ => throw Malformed
      }
      val pieceLen = im.getOrElse("piece length", throw Malformed) match {
        case BInt(v) if v > 0 => v
        case _ => throw Malformed
      }
      val length = im.getOrElse("length", throw Malformed) match {
        case BInt(v) if v >= 0 => v
        case _ => throw Malformed
      }
      val pieces = im.getOrElse("pieces", throw Malformed) match {
        case BStr(s) => s
        case _ => throw Malformed
      }
      if (pieces.length % 20 != 0) throw Malformed
      val nPieces = pieces.length / 20
      // the count must agree with the declared length
      val want = ((length + pieceLen - 1) / pieceLen).toInt
      if (nPieces != want) throw Malformed
      // the payload must BE the declared content
      if (payload.length.toLong != length) throw Malformed
      // THE AUDIT: every piece hash recomputed
      var i = 0
      while (i < nPieces) {
        val from = (i.toLong * pieceLen).toInt
        val to = math.min(length, (i + 1).toLong * pieceLen).toInt
        val h = Sha1.hash(payload, from, to)
        var k = 0
        while (k < 20) {
          if (h(k) != pieces(20 * i + k)) throw Malformed // a lying piece
          k += 1
        }
        i += 1
      }
      val infoHash = Sha1.hash(Bencode.encode(info), 0,
        Bencode.encode(info).length)
      Some(Meta(announce, name, pieceLen, length, nPieces, infoHash))
    } catch {
      case _: Throwable => None
    }

  private[graft] def build(announce: String, name: String, pieceLen: Long,
      payload: Array[Byte], liePiece: Boolean = false,
      unsorted: Boolean = false): Array[Byte] = {
    val nPieces = ((payload.length + pieceLen - 1) / pieceLen).toInt
    val pieces = new Array[Byte](20 * nPieces)
    var i = 0
    while (i < nPieces) {
      val from = (i.toLong * pieceLen).toInt
      val to = math.min(payload.length.toLong, (i + 1).toLong * pieceLen).toInt
      System.arraycopy(Sha1.hash(payload, from, to), 0, pieces, 20 * i, 20)
      i += 1
    }
    if (liePiece && nPieces > 0) pieces(3) = (pieces(3) ^ 0x40).toByte
    val info = BDict(Seq(
      "length" -> BInt(payload.length.toLong),
      "name" -> BStr(name.getBytes("UTF-8")),
      "piece length" -> BInt(pieceLen),
      "pieces" -> BStr(pieces)))
    val meta = Bencode.encode(BDict(Seq(
      "announce" -> BStr(announce.getBytes("UTF-8")),
      "info" -> info)))
    if (!unsorted) meta
    else {
      // swap the bencoded "length" and "name" entries inside info:
      // every value intact, only the canonical-order rule objects
      val s = meta
      val a = indexOfSlice(s, "6:lengthi".getBytes("US-ASCII"))
      val nameKey = s"4:name${name.length}:$name".getBytes("UTF-8")
      val b2 = indexOfSlice(s, nameKey)
      if (a < 0 || b2 < 0) throw Malformed
      val lenEnd = {
        var j = a + 9
        while (s(j) != 'e') j += 1
        j + 1
      }
      val out = new java.io.ByteArrayOutputStream
      out.write(s, 0, a)
      out.write(nameKey, 0, nameKey.length)
      out.write(s, a, lenEnd - a)
      out.write(s, lenEnd + nameKey.length, s.length - lenEnd - nameKey.length)
      out.toByteArray
    }
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}

/** In-plan synthesizer + gate for d153: each doc's text is the
  * payload of a single-file torrent (piece length 256 + doc_id%128),
  * verified end to end — grammar, count-vs-length, every piece hash,
  * the infohash. Damage %7: 0 → metainfo truncation; 3 → a LYING
  * PIECE HASH (payload, grammar and counts intact — only the
  * recompute catches the poisoned shard); 5 → the info dict keys
  * UNSORTED (every value intact — only the canonical rule that
  * infohash reproducibility rests on objects). */
object TorrentSim {

  private[graft] def pieceLen(docId: Long): Long = 256 + docId % 128

  private[graft] def payloadFor(docId: Long, text: String)
      : (Array[Byte], Array[Byte]) = {
    val mode = docId % 7
    val payload = text.getBytes("UTF-8")
    val meta = TorrentMeta.build(s"https://tracker.example$docId/announce",
      s"doc$docId.txt", pieceLen(docId), payload,
      liePiece = mode == 3, unsorted = mode == 5)
    (if (mode == 0) java.util.Arrays.copyOf(meta, meta.length - 7) else meta,
      payload)
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_pieces", LongType),
    StructField("piece_len", LongType),
    StructField("payload_bytes", LongType),
    StructField("name_chars", LongType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val (meta, payload) = payloadFor(id, r.getString(1))
            TorrentMeta.verify(meta, payload) match {
              case Some(m) =>
                Iterator.single(Row(id, m.nPieces.toLong, m.pieceLen,
                  m.length, m.name.length.toLong))
              case None => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
