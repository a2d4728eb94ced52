package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MessagePack — the compact binary record format dataset tooling
  * interchanges rows in (Redis dumps, fluentd pipelines, several
  * WebDataset-adjacent samplers ship .msgpack shards) — from the
  * published spec (msgpack/msgpack spec.md), BOTH directions, with
  * the CANONICAL discipline the d153 bencode rule established:
  *
  *  - every integer must arrive in its SHORTEST form (a value that
  *    fits positive fixint encoded as uint32 means two writers
  *    produce different bytes for the same record — content
  *    addressing over msgpack shards needs the canonical rule, so
  *    non-shortest forms quarantine, never re-normalize); same for
  *    str/bin/array/map length widths;
  *  - strings are STRICTLY validated UTF-8 (str and bin are distinct
  *    types for exactly this reason);
  *  - map keys must be strings and UNIQUE (a duplicate key means the
  *    record reads differently in different languages' dict
  *    semantics);
  *  - floats are float64 or float32 at their stated width; bools and
  *    nil are single bytes; depth is capped (a 10-byte bomb of
  *    nested fixarrays must not recurse the walker into the ground);
  *  - exactly ONE top-level value, no trailing bytes;
  *  - SCOPE: integers live in Long — a uint64 above Long.MaxValue is
  *    spec-legal and canonical but quarantines here by decision (the
  *    ext-type rule's sibling): widening the value model to unsigned
  *    64-bit would push BigInt through every VInt consumer for a
  *    range no producer in this pipeline emits. A corpus that needs
  *    it swaps VInt's carrier, not the walker.
  *
  * No msgpack implementation exists in this container (stated
  * honestly): pinned by encode∘decode identity, the canonical
  * rejection grid, the damage grid and the truncation sweep; the
  * oracle replays record fields closed-form. */
object MsgPack {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  sealed trait V
  case object VNil extends V
  final case class VBool(v: Boolean) extends V
  final case class VInt(v: Long) extends V
  final case class VFloat(v: Double) extends V
  final case class VStr(v: String) extends V
  final case class VBin(v: Array[Byte]) extends V {
    // Array equality is referential; bin values must compare by bytes
    override def equals(o: Any): Boolean = o match {
      case VBin(w) => java.util.Arrays.equals(v, w)
      case _ => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(v)
  }
  final case class VArr(v: Seq[V]) extends V
  final case class VMap(v: Seq[(String, V)]) extends V

  private val MAX_LEN = 1 << 26
  private val MAX_DEPTH = 32

  def decode(b: Array[Byte]): Option[V] =
    try {
      var p = 0
      def need(n: Long): Unit =
        if (n < 0 || p + n > b.length) throw Malformed
      def u8(): Int = { need(1); val v = b(p) & 0xff; p += 1; v }
      def beN(n: Int): Long = {
        need(n)
        var v = 0L; var i = 0
        while (i < n) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
        p += n
        v
      }
      def str(n: Long): String = {
        if (n > MAX_LEN) throw Malformed
        need(n)
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        val s = try dec.decode(
          java.nio.ByteBuffer.wrap(b, p, n.toInt)).toString
        catch { case _: java.nio.charset.CharacterCodingException =>
          throw Malformed }
        p += n.toInt
        s
      }
      def value(depth: Int): V = {
        if (depth > MAX_DEPTH) throw Malformed
        val t = u8()
        t match {
          case x if x <= 0x7f => VInt(x) // positive fixint
          case x if x >= 0xe0 => VInt((x - 256).toLong) // negative fixint
          case x if (x & 0xf0) == 0x80 => vmap(x & 0x0f, depth) // fixmap
          case x if (x & 0xf0) == 0x90 => varr(x & 0x0f, depth) // fixarray
          case x if (x & 0xe0) == 0xa0 => VStr(str(x & 0x1f)) // fixstr
          case 0xc0 => VNil
          case 0xc2 => VBool(false)
          case 0xc3 => VBool(true)
          case 0xc4 => // bin8
            val n = beN(1); if (n > MAX_LEN) throw Malformed
            need(n); val v = java.util.Arrays.copyOfRange(b, p, p + n.toInt)
            p += n.toInt; VBin(v)
          case 0xc5 => // bin16: canonical iff >= 256
            val n = beN(2); if (n < 256 || n > MAX_LEN) throw Malformed
            need(n); val v = java.util.Arrays.copyOfRange(b, p, p + n.toInt)
            p += n.toInt; VBin(v)
          case 0xc6 => // bin32: canonical iff >= 65536
            val n = beN(4); if (n < 65536 || n > MAX_LEN) throw Malformed
            need(n); val v = java.util.Arrays.copyOfRange(b, p, p + n.toInt)
            p += n.toInt; VBin(v)
          case 0xca => VFloat(java.lang.Float.intBitsToFloat(beN(4).toInt).toDouble)
          case 0xcb => VFloat(java.lang.Double.longBitsToDouble(beN(8)))
          case 0xcc => // uint8: canonical iff >= 0x80
            val v = beN(1); if (v < 0x80) throw Malformed; VInt(v)
          case 0xcd => // uint16
            val v = beN(2); if (v < 0x100) throw Malformed; VInt(v)
          case 0xce => // uint32
            val v = beN(4); if (v < 0x10000) throw Malformed; VInt(v)
          case 0xcf => // uint64: canonical iff >= 2^32; > Long.Max refused
            val v = beN(8)
            if (v < 0 || v < (1L << 32)) throw Malformed; VInt(v)
          case 0xd0 => // int8: canonical iff < -32
            val v = beN(1).toByte.toLong; if (v >= -32) throw Malformed; VInt(v)
          case 0xd1 => // int16: canonical iff < -128
            val v = beN(2).toShort.toLong; if (v >= -128) throw Malformed; VInt(v)
          case 0xd2 => // int32: canonical iff < -32768
            val v = beN(4).toInt.toLong; if (v >= -32768) throw Malformed; VInt(v)
          case 0xd3 => // int64: canonical iff < Int.MinValue
            val v = beN(8); if (v >= Int.MinValue.toLong) throw Malformed; VInt(v)
          case 0xd9 => // str8: canonical iff >= 32
            val n = beN(1); if (n < 32) throw Malformed; VStr(str(n))
          case 0xda => // str16
            val n = beN(2); if (n < 256) throw Malformed; VStr(str(n))
          case 0xdb => // str32
            val n = beN(4); if (n < 65536) throw Malformed; VStr(str(n))
          case 0xdc => // array16
            val n = beN(2); if (n < 16) throw Malformed; varr(n.toInt, depth)
          case 0xdd => // array32
            val n = beN(4); if (n < 65536 || n > MAX_LEN) throw Malformed
            varr(n.toInt, depth)
          case 0xde => // map16
            val n = beN(2); if (n < 16) throw Malformed; vmap(n.toInt, depth)
          case 0xdf => // map32
            val n = beN(4); if (n < 65536 || n > MAX_LEN) throw Malformed
            vmap(n.toInt, depth)
          case _ => throw Malformed // ext types out of scope; 0xc1 never used
        }
      }
      def varr(n: Int, depth: Int): VArr = {
        if (n > MAX_LEN) throw Malformed
        VArr((0 until n).map(_ => value(depth + 1)))
      }
      def vmap(n: Int, depth: Int): VMap = {
        if (n > MAX_LEN) throw Malformed
        val seen = scala.collection.mutable.HashSet.empty[String]
        VMap((0 until n).map { _ =>
          val k = value(depth + 1) match {
            case VStr(s) => s
            case _ => throw Malformed // map keys must be strings
          }
          if (!seen.add(k)) throw Malformed // unique keys
          k -> value(depth + 1)
        })
      }
      val v = value(0)
      if (p != b.length) throw Malformed // trailing bytes
      Some(v)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  /** Canonical encoder. */
  private[graft] def encode(v: V): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream
    def beN(x: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { o.write(((x >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
    def emit(v: V): Unit = v match {
      case VNil => o.write(0xc0)
      case VBool(x) => o.write(if (x) 0xc3 else 0xc2)
      case VInt(x) =>
        if (x >= 0 && x <= 0x7f) o.write(x.toInt)
        else if (x < 0 && x >= -32) o.write((x + 256).toInt)
        else if (x >= 0x80 && x <= 0xff) { o.write(0xcc); beN(x, 1) }
        else if (x >= 0x100 && x <= 0xffff) { o.write(0xcd); beN(x, 2) }
        else if (x >= 0x10000 && x <= 0xffffffffL) { o.write(0xce); beN(x, 4) }
        else if (x >= (1L << 32)) { o.write(0xcf); beN(x, 8) }
        else if (x >= -128) { o.write(0xd0); beN(x & 0xff, 1) }
        else if (x >= -32768) { o.write(0xd1); beN(x & 0xffff, 2) }
        else if (x >= Int.MinValue) { o.write(0xd2); beN(x & 0xffffffffL, 4) }
        else { o.write(0xd3); beN(x, 8) }
      case VFloat(x) => o.write(0xcb); beN(java.lang.Double.doubleToLongBits(x), 8)
      case VStr(s) =>
        val bs = s.getBytes("UTF-8")
        if (bs.length < 32) o.write(0xa0 | bs.length)
        else if (bs.length < 256) { o.write(0xd9); beN(bs.length, 1) }
        else if (bs.length < 65536) { o.write(0xda); beN(bs.length, 2) }
        else { o.write(0xdb); beN(bs.length, 4) }
        o.write(bs, 0, bs.length)
      case VBin(bs) =>
        if (bs.length < 256) { o.write(0xc4); beN(bs.length, 1) }
        else if (bs.length < 65536) { o.write(0xc5); beN(bs.length, 2) }
        else { o.write(0xc6); beN(bs.length, 4) }
        o.write(bs, 0, bs.length)
      case VArr(xs) =>
        if (xs.length < 16) o.write(0x90 | xs.length)
        else if (xs.length < 65536) { o.write(0xdc); beN(xs.length, 2) }
        else { o.write(0xdd); beN(xs.length, 4) }
        xs.foreach(emit)
      case VMap(kvs) =>
        if (kvs.length < 16) o.write(0x80 | kvs.length)
        else if (kvs.length < 65536) { o.write(0xde); beN(kvs.length, 2) }
        else { o.write(0xdf); beN(kvs.length, 4) }
        kvs.foreach { case (k, x) => emit(VStr(k)); emit(x) }
    }
    emit(v)
    o.toByteArray
  }
}

/** In-plan synthesizer + gate for d162: each doc becomes one msgpack
  * record whose integer fields deliberately span EVERY canonical
  * width (positive fixint / uint16 / uint32 / uint64, negative
  * fixint / int8 / int16), a string field carrying the doc's REAL
  * text, a fixstr tag array, a float64 exact quarter, a bool and a
  * bin8 blob. Damage %7: 0 → truncation; 3 → a NON-CANONICAL WIDTH
  * (the fixint field re-encoded as uint32, value identical — only
  * the canonical rule objects); 5 → the final bin8's declared length
  * one high (every byte intact — only the end-of-buffer framing
  * objects). */
object MsgPackSim {
  import MsgPack._

  private[graft] def nTags(docId: Long): Int = (1 + docId % 4).toInt
  private[graft] def blobLen(docId: Long): Int = (16 + docId % 17).toInt

  private[graft] def recordFor(docId: Long, text: String): V = {
    val blob = (0 until blobLen(docId))
      .map(k => ((docId * 5 + k) % 97).toByte).toArray
    VMap(Seq(
      "id" -> VInt(docId),
      "small" -> VInt(docId % 100),
      "mid" -> VInt(300 + docId % 60000),
      "big" -> VInt(70000 + docId),
      "huge" -> VInt(5000000000L + docId),
      "neg" -> VInt(-1 - docId % 32),
      "neg16" -> VInt(-200 - docId % 30000),
      "text" -> VStr(text),
      "tags" -> VArr((0 until nTags(docId)).map(t => VStr(s"tag$t"))),
      "pi" -> VFloat(((docId % 64) * 0.25)),
      "flag" -> VBool(docId % 3 == 0),
      "blob" -> VBin(blob)))
  }

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val clean = MsgPack.encode(recordFor(docId, text))
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(clean, clean.length - 4)
      case 3 =>
        // re-encode "small" (a positive fixint, 1 byte) as uint32
        // (5 bytes): find it right after the "small" key bytes
        val key = MsgPack.encode(VStr("small"))
        val at = indexOfSlice(clean, key) + key.length
        val v = clean(at) & 0xff // the fixint byte
        val out = new Array[Byte](clean.length + 4)
        System.arraycopy(clean, 0, out, 0, at)
        out(at) = 0xce.toByte
        out(at + 1) = 0; out(at + 2) = 0; out(at + 3) = 0
        out(at + 4) = v.toByte
        System.arraycopy(clean, at + 1, out, at + 5, clean.length - at - 1)
        out
      case 5 =>
        // bump the final bin8's declared length: blob is the last
        // field, its length byte sits blobLen+1 bytes from the end
        val out = clean.clone()
        val lenAt = out.length - blobLen(docId) - 1
        out(lenAt) = (out(lenAt) + 1).toByte
        out
      case _ => clean
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

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_keys", LongType),
    StructField("id_val", LongType),
    StructField("huge_val", LongType),
    StructField("neg16_val", LongType),
    StructField("text_bytes", LongType),
    StructField("n_tags", LongType),
    StructField("blob_sum", LongType),
    StructField("flag", BooleanType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            MsgPack.decode(payloadFor(id, text)) match {
              case Some(VMap(kvs)) =>
                val m = kvs.toMap
                val blob = m("blob").asInstanceOf[VBin].v
                Iterator.single(Row(id, kvs.size.toLong,
                  m("id").asInstanceOf[VInt].v,
                  m("huge").asInstanceOf[VInt].v,
                  m("neg16").asInstanceOf[VInt].v,
                  m("text").asInstanceOf[VStr].v.getBytes("UTF-8").length.toLong,
                  m("tags").asInstanceOf[VArr].v.size.toLong,
                  blob.map(_.toLong).sum,
                  m("flag").asInstanceOf[VBool].v))
              case _ => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
