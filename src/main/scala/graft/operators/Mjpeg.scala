package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Motion-JPEG-in-AVI reader for the d109 gate — the first COMPRESSED
  * video path (d97's AVI carries raw 24-bit DIB frames): the RIFF/AVI
  * container walk composed with the real baseline JPEG decoder
  * ([[JpegCodec]], d101 — Huffman, dequant, IDCT, color convert, now
  * including 4:2:0), which is exactly how MJPEG is defined: each
  * `00dc` movi chunk is one complete JFIF stream. Camera and capture
  * pipelines still emit this shape, and it is the minimal real case
  * of "container walk + per-frame codec" that every compressed video
  * format shares.
  *
  * Scope (the d98 discipline): one 'vids' stream, `strf`
  * BITMAPINFOHEADER with biCompression = 'MJPG', every frame a
  * baseline JPEG whose dimensions match the stream header —
  * everything else (raw DIB, other codecs, dimension drift,
  * undecodable frames) QUARANTINES rather than crashes. Every
  * declared size is bounds-checked in Long BEFORE use (the d97
  * lying-header discipline: a bad header must return None, never
  * index past the buffer or hang a task on a non-advancing stride).
  *
  * Reference anchor: same constructor∘decoder discipline as the
  * d89-d108 gates (SURVEY §2.5). The JPEG layer is pinned against
  * javax.imageio independently (d101, both directions); this file
  * owns only the container composition.
  */
object MjpegCodec {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** STRICT decode → (frames, w, h, sumR, sumG, sumB) summed over all
    * frames' pixels, or None for anything malformed or out of scope. */
  private[graft] def decode(b: Array[Byte]): Option[Array[Long]] = {
    def u16(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    def u32(i: Int): Long = (u16(i).toLong) | (u16(i + 2).toLong << 16)
    def tag(i: Int, s: String): Boolean =
      i + 4 <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j))
    try {
      if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "AVI ")) return None
      var w = 0; var h = 0; var frames = -1L
      var fmtOk = false
      var moviAt = -1; var moviEnd = -1
      var i = 12
      while (i + 8 <= b.length && (moviAt < 0 || frames < 0)) {
        val sz = u32(i + 4)
        if (i + 8 + sz > b.length) throw Malformed
        if (tag(i, "LIST")) {
          if (i + 12 > b.length) throw Malformed
          if (tag(i + 8, "movi")) { moviAt = i + 12; moviEnd = i + 8 + sz.toInt }
          else if (tag(i + 8, "hdrl")) {
            var j = i + 12
            val hEnd = i + 8 + sz.toInt
            while (j + 8 <= hEnd) {
              val ssz = u32(j + 4)
              if (j + 8 + ssz > hEnd) throw Malformed
              if (tag(j, "avih") && ssz >= 40) {
                frames = u32(j + 8 + 16)
                w = u32(j + 8 + 32).toInt; h = u32(j + 8 + 36).toInt
              } else if (tag(j, "LIST") && tag(j + 8, "strl")) {
                var k = j + 12
                val sEnd = j + 8 + ssz.toInt
                while (k + 8 <= sEnd) {
                  val csz = u32(k + 4)
                  if (k + 8 + csz > sEnd) throw Malformed
                  if (tag(k, "strf") && csz >= 40)
                    // BITMAPINFOHEADER: planes=1, biCompression='MJPG'
                    fmtOk = u16(k + 8 + 12) == 1 && tag(k + 8 + 16, "MJPG")
                  k += 8 + csz.toInt + (csz.toInt & 1)
                }
              }
              j += 8 + ssz.toInt + (ssz.toInt & 1)
            }
          }
        }
        i += 8 + sz.toInt + (sz.toInt & 1)
      }
      if (!fmtOk || frames < 0 || moviAt < 0 || w <= 0 || h <= 0 ||
        moviEnd > b.length) return None
      var sr = 0L; var sg = 0L; var sb = 0L
      var n = 0L
      var p = moviAt
      while (p + 8 <= moviEnd) {
        val csz = u32(p + 4)
        if (!tag(p, "00dc")) throw Malformed
        if (p.toLong + 8 + csz > moviEnd) throw Malformed
        val frame = java.util.Arrays.copyOfRange(b, p + 8, p + 8 + csz.toInt)
        JpegCodec.decodeNative(frame) match {
          case Some((fw, fh, nc, px)) =>
            if (fw != w || fh != h) throw Malformed // dimension drift
            var q = 0
            while (q < px.length) {
              val red = px(q) & 0xFF
              val g = if (nc == 3) px(q + 1) & 0xFF else red
              val bl = if (nc == 3) px(q + 2) & 0xFF else red
              sr += red; sg += g; sb += bl
              q += nc
            }
          case None => throw Malformed // an undecodable frame corrupts the clip
        }
        n += 1
        p += 8 + csz.toInt + (csz.toInt & 1)
      }
      if (n != frames) throw Malformed
      Some(Array(n, w.toLong, h.toLong, sr, sg, sb))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}

/** d109 gate — MJPEG clips synthesized IN-PLAN: every doc becomes an
  * AVI of K = 1 + doc_id%4 frames, each frame a real baseline JPEG
  * (the d101 encoder) of one SOLID gray per frame — gray because the
  * BT.601 matrix maps r=g=b=c to Y=c, Cb=Cr=128 exactly, so each
  * decoded frame is the d101 DC closed form `decodedTile(c)` on every
  * pixel and the oracle replays the full clip sums over a bounded
  * (≤4-frame) grid. Damage slice on doc_id%7: 0 → truncated mid-frame
  * (interrupted write), 3 → biCompression stomped to 'MPEG' (an
  * out-of-scope codec: the scope-quarantine path), 5 → one frame's
  * SOI stomped (frame-level corruption only the per-frame JPEG decode
  * catches — the container framing stays valid). */
object MjpegSim {

  private[graft] def nFrames(docId: Long): Int = (1 + docId % 4).toInt

  private[graft] def dims(docId: Long): (Int, Int) =
    ((8 * (1 + docId % 4)).toInt, (8 * (1 + (docId * 3) % 5)).toInt)

  private[graft] def frameColor(docId: Long, f: Int): Int =
    ((docId * 9 + 13 * f) % 256).toInt

  private def w32le(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xFF).toInt); out.write(((v >> 8) & 0xFF).toInt)
    out.write(((v >> 16) & 0xFF).toInt); out.write(((v >> 24) & 0xFF).toInt)
  }
  private def w16le(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }
  private def tag(out: java.io.ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  /** One solid-gray JPEG frame. */
  private[graft] def frameJpeg(docId: Long, f: Int): Array[Byte] = {
    val (w, h) = dims(docId)
    val c = frameColor(docId, f).toByte
    val px = new Array[Byte](3 * w * h)
    java.util.Arrays.fill(px, c)
    JpegCodec.encode(w, h, px, comps = 3)
  }

  private[graft] def cleanAvi(docId: Long, stompCodec: Boolean = false,
                              stompFrame: Int = -1): Array[Byte] = {
    val (w, h) = dims(docId)
    val k = nFrames(docId)
    val jpegs = (0 until k).map { f =>
      val j = frameJpeg(docId, f)
      if (f == stompFrame) { j(0) = 'X'; j(1) = 'X' }
      j
    }
    // movi payload: '00dc' chunks padded to even
    val movi = new java.io.ByteArrayOutputStream()
    jpegs.foreach { j =>
      tag(movi, "00dc"); w32le(movi, j.length.toLong)
      movi.write(j, 0, j.length)
      if ((j.length & 1) == 1) movi.write(0)
    }
    val moviBytes = movi.toByteArray
    // strf: BITMAPINFOHEADER (40 bytes)
    val strf = new java.io.ByteArrayOutputStream()
    w32le(strf, 40); w32le(strf, w.toLong); w32le(strf, h.toLong)
    w16le(strf, 1) // planes
    w16le(strf, 24) // bit count (nominal for MJPG)
    tag(strf, if (stompCodec) "MPEG" else "MJPG") // biCompression
    w32le(strf, 3L * w * h); w32le(strf, 0); w32le(strf, 0)
    w32le(strf, 0); w32le(strf, 0)
    val strfB = strf.toByteArray
    // strh: AVISTREAMHEADER (56 bytes) — fccType 'vids', handler 'MJPG'
    val strh = new java.io.ByteArrayOutputStream()
    tag(strh, "vids"); tag(strh, "MJPG")
    w32le(strh, 0); w16le(strh, 0); w16le(strh, 0); w32le(strh, 0)
    w32le(strh, 1); w32le(strh, 25) // rate 25/1
    w32le(strh, 0); w32le(strh, k.toLong); w32le(strh, 0)
    w32le(strh, 0xFFFFFFFFL); w32le(strh, 0)
    w16le(strh, 0); w16le(strh, 0); w16le(strh, w); w16le(strh, h)
    val strhB = strh.toByteArray
    // avih: MainAVIHeader (56 bytes)
    val avih = new java.io.ByteArrayOutputStream()
    w32le(avih, 40000); w32le(avih, 0); w32le(avih, 0); w32le(avih, 0x10)
    w32le(avih, k.toLong) // total frames @16
    w32le(avih, 0); w32le(avih, 1); w32le(avih, 0)
    w32le(avih, w.toLong) // @32
    w32le(avih, h.toLong) // @36
    w32le(avih, 0); w32le(avih, 0); w32le(avih, 0); w32le(avih, 0)
    val avihB = avih.toByteArray
    // assemble: strl = strh + strf; hdrl = avih + LIST strl
    def chunk(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(body.length + 8)
      tag(o, fourcc); w32le(o, body.length.toLong); o.write(body, 0, body.length)
      if ((body.length & 1) == 1) o.write(0)
      o.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(body.length + 12)
      tag(o, "LIST"); w32le(o, body.length.toLong + 4); tag(o, kind)
      o.write(body, 0, body.length)
      o.toByteArray
    }
    val strl = list("strl", chunk("strh", strhB) ++ chunk("strf", strfB))
    val hdrl = list("hdrl", chunk("avih", avihB) ++ strl)
    val moviL = list("movi", moviBytes)
    val riffBody = hdrl ++ moviL
    val out = new java.io.ByteArrayOutputStream(riffBody.length + 12)
    tag(out, "RIFF"); w32le(out, riffBody.length.toLong + 4); tag(out, "AVI ")
    out.write(riffBody, 0, riffBody.length)
    out.toByteArray
  }

  private[graft] def payloadFor(docId: Long): Array[Byte] =
    (docId % 7) match {
      case 0 =>
        val clean = cleanAvi(docId)
        java.util.Arrays.copyOf(clean, clean.length - 7)
      case 3 => cleanAvi(docId, stompCodec = true)
      case 5 => cleanAvi(docId, stompFrame = (docId % nFrames(docId)).toInt)
      case _ => cleanAvi(docId)
    }

  private val payloadSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  /** doc_id → MJPEG AVI payload. Map-only, id-driven. */
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
    StructField("n_frames", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  /** Batched strict MJPEG decode → per-clip stats with quarantine —
    * the d109 gate, same mapPartitions batch contract as the other
    * codec gates. */
  def stats(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    withPayloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            MjpegCodec.decode(r.getAs[Array[Byte]](1)) match {
              case Some(Array(n, w, h, sr, sg, sb)) =>
                Row(id, "ok", n, w.toInt, h.toInt, sr, sg, sb)
              case _ =>
                Row(id, "quarantined", null, null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
