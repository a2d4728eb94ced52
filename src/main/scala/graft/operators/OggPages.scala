package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ogg — the container Vorbis/Opus speech corpora ship in (Common
  * Voice distributes MP3+Ogg; podcast mirrors carry .ogg/.opus) —
  * the page framing from RFC 3533, walked STRICTLY without codec
  * decode (the ingest questions are pages, packets, bytes, intact):
  *
  *  - per page: `OggS` capture pattern, version 0, a header-type
  *    byte whose reserved bits (3-7) MUST be zero — bit 0
  *    continuation, bit 1 BOS (first page only), bit 2 EOS (last
  *    page only); granule position (8 B LE, -1 = "no packet
  *    completes here", otherwise NON-DECREASING across the stream);
  *    one bitstream serial for the whole stream (scope: a single
  *    logical stream — a mid-file serial change is a splice); page
  *    sequence numbers dense from 0 (a gap is a lost page);
  *  - THE LACING GRAMMAR: a segment table of N lacing values — 255
  *    continues a packet, < 255 terminates it; a packet whose last
  *    lacing on a page is 255 continues on the NEXT page, which must
  *    set the continuation bit (and must not when it doesn't) — the
  *    rule that makes packet reassembly unambiguous;
  *  - THE CRC AUDIT: each page carries a CRC-32 (poly 0x04C11DB7,
  *    init 0, no reflection, no final xor — Ogg's own variant)
  *    computed over the whole page with the CRC field zeroed,
  *    RECOMPUTED here; a page that fails its checksum is corruption
  *    the capture-pattern scan alone would miss.
  *
  * Packets are reassembled across pages and the payload is compared
  * byte-for-byte against the source text in-plan (roundtrip_ok), so
  * every downstream consumer of the payload is exercised, not just
  * the framing. No Ogg implementation exists in this container
  * (stated honestly): pinned by encode∘decode identity, the damage
  * grid and the truncation sweep; the oracle replays page/packet
  * geometry closed-form off UTF-8 byte lengths. */
object OggPages {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Ogg CRC-32: poly 0x04C11DB7, init 0, MSB-first, no final xor. */
  private[graft] def crc32(b: Array[Byte], from: Int, to: Int): Long = {
    var crc = 0L
    var i = from
    while (i < to) {
      crc ^= (b(i) & 0xffL) << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000L) != 0) ((crc << 1) ^ 0x04C11DB7L) & 0xffffffffL
              else (crc << 1) & 0xffffffffL
        k += 1
      }
      i += 1
    }
    crc
  }

  final case class Page(headerType: Int, granule: Long, serial: Long,
      seq: Long, nSegs: Int, payloadLen: Int)
  final case class Stream(pages: Seq[Page], packets: Seq[Array[Byte]])

  def decode(b: Array[Byte]): Option[Stream] =
    try {
      var p = 0
      val pages = Seq.newBuilder[Page]
      val packets = Seq.newBuilder[Array[Byte]]
      var current = new java.io.ByteArrayOutputStream
      var midPacket = false
      var serial0 = -1L
      var expectSeq = 0L
      var lastGranule = Long.MinValue
      var sawEos = false
      var first = true
      def u32(i: Int): Long = {
        var v = 0L; var k = 0
        while (k < 4) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
        v
      }
      def u64(i: Int): Long = {
        var v = 0L; var k = 0
        while (k < 8) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
        v
      }
      while (p < b.length) {
        if (sawEos) throw Malformed // pages after the EOS page
        if (p + 27 > b.length) throw Malformed
        if (b(p) != 'O' || b(p + 1) != 'g' || b(p + 2) != 'g' ||
          b(p + 3) != 'S') throw Malformed
        if (b(p + 4) != 0) throw Malformed // stream structure version
        val ht = b(p + 5) & 0xff
        if ((ht & 0xf8) != 0) throw Malformed // reserved bits zero
        val granule = u64(p + 6)
        val serial = u32(p + 14)
        val seq = u32(p + 18)
        val storedCrc = u32(p + 22)
        val nSegs = b(p + 26) & 0xff
        if (p + 27 + nSegs > b.length) throw Malformed
        var payloadLen = 0
        var i = 0
        while (i < nSegs) { payloadLen += b(p + 27 + i) & 0xff; i += 1 }
        val pageEnd = p + 27 + nSegs + payloadLen
        if (pageEnd > b.length) throw Malformed
        // CRC over the page with the CRC field zeroed (RFC 3533 §6):
        // pages are ≤ 64 KB, so the zeroed copy is cheap and the
        // recompute stays one readable pass
        val pageCopy = java.util.Arrays.copyOfRange(b, p, pageEnd)
        java.util.Arrays.fill(pageCopy, 22, 26, 0.toByte)
        if (crc32(pageCopy, 0, pageCopy.length) != storedCrc) throw Malformed
        // stream discipline
        if (first) {
          if ((ht & 0x02) == 0) throw Malformed // first page must be BOS
          serial0 = serial
        } else {
          if ((ht & 0x02) != 0) throw Malformed // BOS later = splice
          if (serial != serial0) throw Malformed
        }
        if (seq != expectSeq) throw Malformed // lost page
        expectSeq += 1
        if ((ht & 0x04) != 0) sawEos = true
        // continuation flag must match reality
        if (((ht & 0x01) != 0) != midPacket) throw Malformed
        if (granule != -1L) {
          if (granule < lastGranule) throw Malformed // time runs backward
          lastGranule = granule
        }
        // lacing walk
        var completed = false
        i = 0
        var q = p + 27 + nSegs
        while (i < nSegs) {
          val lace = b(p + 27 + i) & 0xff
          current.write(b, q, lace)
          q += lace
          if (lace < 255) {
            packets += current.toByteArray
            current = new java.io.ByteArrayOutputStream
            midPacket = false
            completed = true
          } else midPacket = true
          i += 1
        }
        // RFC 3533: a page where no packet completes carries -1
        if (!completed && granule != -1L) throw Malformed
        if (completed && granule == -1L) throw Malformed
        pages += Page(ht, granule, serial, seq, nSegs, payloadLen)
        first = false
        p = pageEnd
      }
      if (first) throw Malformed // empty stream
      if (!sawEos) throw Malformed // last page must be EOS
      if (midPacket) throw Malformed // packet left dangling
      Some(Stream(pages.result(), packets.result()))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
}

/** In-plan synthesizer + gate for d161: each doc's REAL UTF-8 bytes
  * become K = 2 + doc_id%4 packets (even byte slices), laced 255-run
  * style and packed greedily THREE SEGMENTS PER PAGE — small pages on
  * purpose, so packets routinely span pages and the continuation-flag
  * rule is exercised corpus-wide, not in a corner case. Granule = the
  * cumulative packet count when a packet completes on the page, -1
  * otherwise (the RFC rule). Serial fixed per stream from doc_id.
  * Damage %7: 0 → truncation; 3 → the LAST page's granule set to -1
  * (a packet completes there, so -1 is a lie — every byte else
  * intact, CRC recomputed over the lie: only the granule rule
  * objects); 5 → page 0's stored CRC flipped (only the recompute
  * objects). */
object OggSim {

  private[graft] def nPackets(docId: Long): Int = (2 + docId % 4).toInt

  private[graft] def packetsFor(docId: Long, text: String): Seq[Array[Byte]] = {
    val bytes = text.getBytes("UTF-8")
    val k = nPackets(docId)
    (0 until k).map { i =>
      val a = (i.toLong * bytes.length / k).toInt
      val b = ((i + 1).toLong * bytes.length / k).toInt
      java.util.Arrays.copyOfRange(bytes, a, b)
    }
  }

  private val SEGS_PER_PAGE = 3

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val mode = docId % 7
    val packets = packetsFor(docId, text)
    // one flat lacing sequence: (lace value, bytes, packetIdx, terminal)
    final case class Lace(v: Int, bytes: Array[Byte], terminal: Boolean,
        packet: Int)
    val laces = packets.zipWithIndex.flatMap { case (pk, pi) =>
      val full = pk.length / 255
      val rem = pk.length % 255
      (0 until full).map(j =>
        Lace(255, java.util.Arrays.copyOfRange(pk, j * 255, (j + 1) * 255),
          terminal = false, pi)) :+
        Lace(rem, java.util.Arrays.copyOfRange(pk, full * 255, pk.length),
          terminal = true, pi)
    }
    val pages = laces.grouped(SEGS_PER_PAGE).toSeq
    val out = new java.io.ByteArrayOutputStream
    var completedSoFar = 0L
    var midPacket = false
    pages.zipWithIndex.foreach { case (pg, pgIdx) =>
      val isFirst = pgIdx == 0
      val isLast = pgIdx == pages.length - 1
      val completesHere = pg.count(_.terminal)
      completedSoFar += completesHere
      val granule0 =
        if (completesHere > 0) completedSoFar else -1L
      val granule =
        if (mode == 3 && isLast) -1L // the lie: a packet DOES complete
        else granule0
      var ht = 0
      if (midPacket) ht |= 0x01
      if (isFirst) ht |= 0x02
      if (isLast) ht |= 0x04
      val page = new java.io.ByteArrayOutputStream
      page.write('O'); page.write('g'); page.write('g'); page.write('S')
      page.write(0)
      page.write(ht)
      (0 until 8).foreach(k => page.write(((granule >> (8 * k)) & 0xff).toInt))
      val serial = docId & 0xffffffffL
      (0 until 4).foreach(k => page.write(((serial >> (8 * k)) & 0xff).toInt))
      (0 until 4).foreach(k => page.write(((pgIdx.toLong >> (8 * k)) & 0xff).toInt))
      (0 until 4).foreach(_ => page.write(0)) // CRC placeholder
      page.write(pg.length)
      pg.foreach(l => page.write(l.v))
      pg.foreach(l => page.write(l.bytes, 0, l.bytes.length))
      val pb = page.toByteArray
      var crc = OggPages.crc32(pb, 0, pb.length)
      if (mode == 5 && pgIdx == 0) crc ^= 0x00040004L
      (0 until 4).foreach(k => pb(22 + k) = ((crc >> (8 * k)) & 0xff).toByte)
      out.write(pb, 0, pb.length)
      midPacket = !pg.last.terminal
    }
    val clean = out.toByteArray
    if (mode == 0) java.util.Arrays.copyOf(clean, clean.length - 5)
    else clean
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_pages", LongType),
    StructField("n_packets", LongType),
    StructField("payload_bytes", LongType),
    StructField("roundtrip_ok", BooleanType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            OggPages.decode(payloadFor(id, text)) match {
              case Some(st) =>
                val joined = {
                  val o = new java.io.ByteArrayOutputStream
                  st.packets.foreach(p => o.write(p, 0, p.length))
                  o.toByteArray
                }
                Iterator.single(Row(id,
                  st.pages.size.toLong,
                  st.packets.size.toLong,
                  st.packets.map(_.length.toLong).sum,
                  java.util.Arrays.equals(joined, text.getBytes("UTF-8"))))
              case None => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
