package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MP3 (MPEG-1 Audio Layer III) frame walk — how a speech/music
  * corpus actually arrives (podcast archives, Common Voice mirrors,
  * YouTube audio rips all ship MP3): the frame-sync grammar from
  * ISO/IEC 11172-3, walked STRICTLY, without decoding audio — the
  * ingest questions are "how many frames, how long, is the container
  * intact", and a frame walk answers them at scan speed:
  *
  *  - optional ID3v2 prefix ("ID3", version, flags, 4 SYNCSAFE size
  *    bytes — the high bit of each must be 0, the rule that keeps a
  *    tag length from aliasing a frame sync) skipped, its span
  *    reported; optional ID3v1 "TAG" trailer (fixed 128 bytes);
  *  - each frame: 11-bit sync (0xFFE), version MPEG-1 (scope —
  *    reserved version bits quarantine), Layer III, a bitrate index
  *    from the published MPEG-1 L3 table (free(0) is out of scope,
  *    15 is forbidden by the spec), sampling rate (reserved
  *    quarantines), padding bit, channel mode, reserved emphasis(2)
  *    quarantines; frame length = 144000·kbps/samplerate + pad —
  *    THE FRAMING FIELD: a lying bitrate index shifts every later
  *    sync, which is exactly what the walk catches;
  *  - protected frames (protection bit 0) carry a CRC-16
  *    (x¹⁶+x¹⁵+x²+1, init 0xFFFF — the 11172-3 polynomial) over the
  *    last two header bytes + the Layer III side info (17 bytes
  *    mono / 32 otherwise), RECOMPUTED here — a frame that fails its
  *    own checksum is corruption the sync walk alone would miss;
  *  - stream discipline: every frame must agree on version, layer
  *    and sampling rate (a mid-stream rate change is a spliced
  *    file), and frames + tags must tile the payload to EOF.
  *
  * No MP3 implementation exists in this container (stated honestly):
  * pinned by encode∘decode identity, the damage grid and the
  * truncation sweep; the oracle replays frame geometry closed-form. */
object Mp3Frames {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** MPEG-1 Layer III bitrate table (kbps), index 1..14; 0 = free
    * (out of scope), 15 = forbidden. */
  private[graft] val BITRATE = Array(
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
  private[graft] val SAMPLERATE = Array(44100, 48000, 32000, -1)

  final case class Frame(kbps: Int, sampleRate: Int, padded: Boolean,
      mono: Boolean, protected_ : Boolean, length: Int)
  final case class Mp3(id3Bytes: Int, id3v1: Boolean, frames: Seq[Frame])

  /** CRC-16 of ISO/IEC 11172-3: poly 0x8005 MSB-first, init 0xFFFF. */
  private[graft] def crc16(bytes: Array[Byte], from: Int, to: Int,
      init: Int = 0xFFFF): Int = {
    var crc = init
    var i = from
    while (i < to) {
      crc ^= (bytes(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
              else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  def decode(b: Array[Byte]): Option[Mp3] =
    try {
      var p = 0
      var id3Bytes = 0
      // ID3v2 prefix
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        if ((b(3) & 0xFF) == 0xFF || (b(4) & 0xFF) == 0xFF) throw Malformed
        var size = 0
        var i = 6
        while (i < 10) {
          val v = b(i) & 0xFF
          if ((v & 0x80) != 0) throw Malformed // syncsafe: high bit zero
          size = (size << 7) | v
          i += 1
        }
        id3Bytes = 10 + size
        if (id3Bytes > b.length) throw Malformed
        p = id3Bytes
      }
      // frame walk over [start, end): throws unless frames tile exactly
      def walk(start: Int, end: Int): Seq[Frame] = {
        val frames = Seq.newBuilder[Frame]
        var q = start
        var sr0 = -1
        var n = 0
        while (q < end) {
          if (q + 4 > end) throw Malformed
          val h1 = b(q) & 0xFF; val h2 = b(q + 1) & 0xFF
          val h3 = b(q + 2) & 0xFF; val h4 = b(q + 3) & 0xFF
          if (h1 != 0xFF || (h2 & 0xE0) != 0xE0) throw Malformed // sync
          if (((h2 >> 3) & 0x3) != 3) throw Malformed // MPEG-1 only
          if (((h2 >> 1) & 0x3) != 1) throw Malformed // Layer III only
          val protect = (h2 & 1) == 0
          val brIdx = (h3 >> 4) & 0xF
          if (brIdx == 0 || brIdx == 15) throw Malformed // free / forbidden
          val srIdx = (h3 >> 2) & 0x3
          if (srIdx == 3) throw Malformed // reserved
          if (sr0 < 0) sr0 = srIdx
          else if (srIdx != sr0) throw Malformed // spliced stream
          val padded = ((h3 >> 1) & 1) == 1
          val mode = (h4 >> 6) & 0x3
          if ((h4 & 0x3) == 2) throw Malformed // reserved emphasis
          val kbps = BITRATE(brIdx)
          val sr = SAMPLERATE(srIdx)
          val len = 144000 * kbps / sr + (if (padded) 1 else 0)
          if (q + len > end) throw Malformed
          val sideInfo = if (mode == 3) 17 else 32
          if (protect) {
            if (4 + 2 + sideInfo > len) throw Malformed
            val stored = ((b(q + 4) & 0xFF) << 8) | (b(q + 5) & 0xFF)
            // CRC over the last two header bytes, then the side info
            val crcHdr = crc16(b, q + 2, q + 4)
            val crc = crc16(b, q + 6, q + 6 + sideInfo, crcHdr)
            if (crc != stored) throw Malformed
          } else if (4 + sideInfo > len) throw Malformed
          frames += Frame(kbps, sr, padded, mode == 3, protect, len)
          q += len
          n += 1
          if (n > 1000000) throw Malformed
        }
        val fs = frames.result()
        if (fs.isEmpty) throw Malformed
        fs
      }
      // ID3v1 trailer: the 'TAG' bytes at EOF-128 are only a TRAILER
      // if treating them as one makes the frame walk tile exactly —
      // a clean stream whose frame CONTENT happens to read 'TAG' at
      // exactly EOF-128 (a protected frame's CRC bytes 0x54 0x41 with
      // side-info 0x47 there is enough) must not be falsely truncated
      // (r14 advice). Try with-trailer first, fall back to without;
      // both failing is the genuine quarantine.
      val tagAt = b.length - p >= 128 &&
        b(b.length - 128) == 'T' && b(b.length - 127) == 'A' &&
        b(b.length - 126) == 'G'
      val (fs, id3v1) =
        if (tagAt)
          (try (walk(p, b.length - 128), true)
           catch { case Malformed => (walk(p, b.length), false) })
        else (walk(p, b.length), false)
      Some(Mp3(id3Bytes, id3v1, fs))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
}

/** In-plan synthesizer + gate for d160: each doc becomes an MP3-framed
  * clip of F = 3 + doc_id%5 frames at 44.1 kHz, channel mode fixed
  * per stream (mono when doc_id odd), bitrate index rotating
  * 1 + (doc_id + f)%14, padding (doc_id + f)%2, every third frame
  * protected with a REAL recomputable CRC-16 over header + side info;
  * docs with doc_id%4 == 0 carry an ID3v2 prefix of 20 + doc_id%50
  * payload bytes (syncsafe length) and doc_id%6 == 0 an ID3v1
  * trailer. Damage %7: 0 → truncation; 3 → a LYING BITRATE INDEX on
  * frame 1 (bytes written at the true length — the framing walk
  * derails at the next sync); 5 → a protected frame's stored CRC
  * flipped (every byte else intact — only the recompute objects). */
object Mp3Sim {

  private[graft] def nFrames(docId: Long): Int = (3 + docId % 5).toInt
  private[graft] def brIdx(docId: Long, f: Int): Int =
    (1 + (docId + f) % 14).toInt
  private[graft] def hasId3v2(docId: Long): Boolean = docId % 4 == 0
  private[graft] def id3PayloadLen(docId: Long): Int = (20 + docId % 50).toInt
  private[graft] def hasId3v1(docId: Long): Boolean = docId % 6 == 0
  private[graft] def mono(docId: Long): Boolean = docId % 2 == 1
  private[graft] def isProtected(docId: Long, f: Int): Boolean =
    (docId + f) % 3 == 0
  private[graft] def padBit(docId: Long, f: Int): Int = ((docId + f) % 2).toInt
  private[graft] def frameLen(docId: Long, f: Int): Int =
    144000 * Mp3Frames.BITRATE(brIdx(docId, f)) / 44100 + padBit(docId, f)

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream
    if (hasId3v2(docId)) {
      o.write('I'); o.write('D'); o.write('3')
      o.write(4); o.write(0); o.write(0) // v2.4, no flags
      val sz = id3PayloadLen(docId)
      o.write((sz >> 21) & 0x7F); o.write((sz >> 14) & 0x7F)
      o.write((sz >> 7) & 0x7F); o.write(sz & 0x7F)
      (0 until sz).foreach(k => o.write(((docId + k) % 200).toInt))
    }
    val mode = docId % 7
    (0 until nFrames(docId)).foreach { f =>
      val idx0 = brIdx(docId, f)
      val trueLen = frameLen(docId, f)
      // the %7==3 lie: frame 1's header declares one bitrate step DOWN
      // while its bytes keep the TRUE length — the walk resumes inside
      // frame 1's own payload, whose bytes are all < 0xFF by
      // construction, so the next sync check ALWAYS objects (a step UP
      // could, for specific length congruences, skip exactly one later
      // frame and re-tile — an invisible lie)
      val declIdx =
        if (mode == 3 && f == 1) { if (idx0 > 1) idx0 - 1 else 2 }
        else idx0
      val prot = isProtected(docId, f)
      val isMono = mono(docId)
      val frame = new Array[Byte](trueLen)
      frame(0) = 0xFF.toByte
      frame(1) = (0xE0 | (3 << 3) | (1 << 1) | (if (prot) 0 else 1)).toByte
      frame(2) = ((declIdx << 4) | (0 << 2) | (padBit(docId, f) << 1)).toByte
      frame(3) = (((if (isMono) 3 else 0) << 6) | 0).toByte
      val sideInfo = if (isMono) 17 else 32
      val dataStart = 4 + (if (prot) 2 else 0)
      (dataStart + sideInfo until trueLen).foreach { k =>
        frame(k) = ((docId + f * 11 + k) % 253).toByte
      }
      ((dataStart) until (dataStart + sideInfo)).foreach { k =>
        frame(k) = ((docId * 3 + f * 7 + k) % 251).toByte
      }
      if (prot) {
        val crcHdr = Mp3Frames.crc16(frame, 2, 4)
        var crc = Mp3Frames.crc16(frame, 6, 6 + sideInfo, crcHdr)
        // the %7==5 lie: the FIRST protected frame's stored CRC
        // flipped (one always exists — nFrames ≥ 3 covers a full
        // residue cycle of the protection rule)
        val firstProt = (0 until nFrames(docId))
          .find(isProtected(docId, _)).get
        if (mode == 5 && f == firstProt) crc ^= 0x0404
        frame(4) = ((crc >> 8) & 0xFF).toByte
        frame(5) = (crc & 0xFF).toByte
      }
      o.write(frame, 0, trueLen)
    }
    if (hasId3v1(docId)) {
      val tag = new Array[Byte](128)
      tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
      (3 until 128).foreach(k => tag(k) = ((docId + k) % 120).toByte)
      o.write(tag, 0, 128)
    }
    val clean = o.toByteArray
    if (mode == 0) java.util.Arrays.copyOf(clean, clean.length - 5)
    else clean
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_frames", LongType),
    StructField("n_protected", LongType),
    StructField("n_samples", LongType),
    StructField("kbps_sum", LongType),
    StructField("music_bytes", LongType),
    StructField("id3_bytes", LongType),
    StructField("has_id3v1", BooleanType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            Mp3Frames.decode(payloadFor(id)) match {
              case Some(m) =>
                Iterator.single(Row(id,
                  m.frames.size.toLong,
                  m.frames.count(_.protected_).toLong,
                  m.frames.size.toLong * 1152L,
                  m.frames.map(_.kbps.toLong).sum,
                  m.frames.map(_.length.toLong).sum,
                  m.id3Bytes.toLong,
                  m.id3v1))
              case None => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
