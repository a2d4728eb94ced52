package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CBOR (RFC 8949) — msgpack's IETF-standardized sibling: the binary
  * record format of COSE/WebAuthn, CWT tokens, and a growing share of
  * IoT/ML telemetry shards — BOTH directions, under the RFC's own
  * CORE DETERMINISTIC ENCODING rules (§4.2.1), which go one step
  * beyond the d162 canonical-width discipline:
  *
  *  - every integer and every length arrives in its SHORTEST form
  *    (ai 24/25/26/27 each have a minimum value; a 1 encoded in four
  *    bytes quarantines, never re-normalizes);
  *  - NO indefinite lengths (ai 31 is forbidden by deterministic
  *    encoding — streaming writers re-frame before interchange);
  *  - map keys are SORTED by the bytewise lexicographic order of
  *    their ENCODED representation — the rule that makes two
  *    deterministic encoders byte-identical (and content addressing
  *    over CBOR shards possible); unsorted or duplicate keys
  *    quarantine;
  *  - text (major 3) is STRICTLY validated UTF-8; bytes (major 2)
  *    and text are distinct types, honored;
  *  - ai 28–30 are reserved → quarantine; simple values beyond
  *    false/true/null quarantine; floats are float64 at ai 27 (the
  *    sim's floats are exact quarters so cross-engine equality is
  *    bitwise);
  *  - SCOPE (documented decisions): tags (major 6) quarantine — the
  *    data subset carries no epoch/bignum tags here, and a strict
  *    walker surfaces them rather than guessing semantics; float16/
  *    float32 (ai 25/26 under major 7) quarantine — deterministic
  *    encoding §4.2.2's shortest-float variant is a PREFERENCE, not
  *    core, and this pipeline pins the 64-bit form; uint64 above
  *    Long.MaxValue quarantines (the d162 Long-carrier rule);
  *  - depth capped; exactly ONE top-level value, zero trailing bytes.
  *
  * No CBOR implementation exists in this container (stated honestly):
  * pinned by encode∘decode identity, the canonical/deterministic
  * rejection grids, the damage grid and the truncation sweep; the
  * oracle replays record fields closed-form (the d162 pattern). */
object Cbor {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  sealed trait V
  case object VNull extends V
  final case class VBool(v: Boolean) extends V
  final case class VInt(v: Long) extends V
  final case class VFloat(v: Double) extends V
  final case class VStr(v: String) extends V
  final case class VBytes(v: Array[Byte]) extends V {
    override def equals(o: Any): Boolean = o match {
      case VBytes(w) => java.util.Arrays.equals(v, w)
      case _ => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(v)
  }
  final case class VArr(v: Seq[V]) extends V
  final case class VMap(v: Seq[(String, V)]) extends V

  private val MAX_LEN = 1 << 26
  private val MAX_DEPTH = 32

  // ---- encode (deterministic / canonical) ---------------------------

  private def head(o: java.io.ByteArrayOutputStream, major: Int, v: Long): Unit = {
    require(v >= 0)
    if (v < 24) o.write((major << 5) | v.toInt)
    else if (v < 0x100) { o.write((major << 5) | 24); o.write(v.toInt) }
    else if (v < 0x10000) {
      o.write((major << 5) | 25)
      o.write((v >> 8).toInt & 0xff); o.write(v.toInt & 0xff)
    } else if (v < 0x100000000L) {
      o.write((major << 5) | 26)
      var i = 3
      while (i >= 0) { o.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
    } else {
      o.write((major << 5) | 27)
      var i = 7
      while (i >= 0) { o.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
    }
  }

  private def encodeTo(o: java.io.ByteArrayOutputStream, v: V): Unit = v match {
    case VInt(x) if x >= 0 => head(o, 0, x)
    case VInt(x) => head(o, 1, -1 - x)
    case VBytes(b) => head(o, 2, b.length.toLong); o.write(b, 0, b.length)
    case VStr(s) =>
      val b = s.getBytes("UTF-8")
      head(o, 3, b.length.toLong); o.write(b, 0, b.length)
    case VArr(es) => head(o, 4, es.length.toLong); es.foreach(encodeTo(o, _))
    case VMap(kvs) =>
      // deterministic encoding: keys sorted by the bytewise order of
      // their encoded form; the ENCODER enforces what the decoder
      // checks, so encode∘decode identity covers the rule
      val enc = kvs.map { case (k, vv) =>
        val ko = new java.io.ByteArrayOutputStream()
        encodeTo(ko, VStr(k))
        (ko.toByteArray, vv)
      }.sortWith((a, b) => byteLt(a._1, b._1))
      head(o, 5, kvs.length.toLong)
      enc.foreach { case (kb, vv) => o.write(kb, 0, kb.length); encodeTo(o, vv) }
    case VBool(false) => o.write(0xf4)
    case VBool(true) => o.write(0xf5)
    case VNull => o.write(0xf6)
    case VFloat(x) =>
      o.write(0xfb)
      val bits = java.lang.Double.doubleToLongBits(x)
      var i = 7
      while (i >= 0) { o.write(((bits >> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  private[operators] def byteLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  def encode(v: V): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    encodeTo(o, v)
    o.toByteArray
  }

  // ---- decode (strict deterministic) --------------------------------

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
      /** Decode a head's value, enforcing the shortest-form rule. */
      def arg(ai: Int): Long = ai match {
        case x if x < 24 => x.toLong
        case 24 => val v = beN(1); if (v < 24) throw Malformed; v
        case 25 => val v = beN(2); if (v < 0x100) throw Malformed; v
        case 26 => val v = beN(4); if (v < 0x10000) throw Malformed; v
        case 27 =>
          val v = beN(8)
          // negative Long = a uint64 above Long.MaxValue (scope rule)
          if (v < 0x100000000L) throw Malformed; v
        case _ => throw Malformed // 28-30 reserved, 31 indefinite
      }
      def text(n: Long): String = {
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
        val ib = u8()
        val major = ib >> 5
        val ai = ib & 0x1f
        major match {
          case 0 => VInt(arg(ai))
          case 1 =>
            val n = arg(ai)
            if (n < 0) throw Malformed // -1-n below Long.MinValue
            VInt(-1 - n)
          case 2 =>
            val n = arg(ai)
            if (n > MAX_LEN) throw Malformed
            need(n)
            val v = java.util.Arrays.copyOfRange(b, p, p + n.toInt)
            p += n.toInt
            VBytes(v)
          case 3 => VStr(text(arg(ai)))
          case 4 =>
            val n = arg(ai)
            if (n > MAX_LEN) throw Malformed
            VArr((0L until n).map(_ => value(depth + 1)))
          case 5 =>
            val n = arg(ai)
            if (n > MAX_LEN) throw Malformed
            var prevKey: Array[Byte] = null
            val kvs = (0L until n).map { _ =>
              val keyStart = p
              val k = value(depth + 1) match {
                case VStr(s) => s // keys must be text (scope rule)
                case _ => throw Malformed
              }
              val keyEnc = java.util.Arrays.copyOfRange(b, keyStart, p)
              // deterministic order: strictly ascending encoded keys
              // (equality = duplicate, also refused)
              if (prevKey != null && !byteLt(prevKey, keyEnc))
                throw Malformed
              prevKey = keyEnc
              k -> value(depth + 1)
            }
            VMap(kvs)
          case 6 => throw Malformed // tags out of scope (documented)
          case 7 => ai match {
            case 20 => VBool(false)
            case 21 => VBool(true)
            case 22 => VNull
            case 27 => VFloat(java.lang.Double.longBitsToDouble(beN(8)))
            case _ => throw Malformed // f16/f32/simple/indefinite
          }
          case _ => throw Malformed
        }
      }
      val v = value(0)
      if (p != b.length) throw Malformed // exactly one value, no tail
      Some(v)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
    }
}

/** Deterministic CBOR record per document — the d162 record model
  * (every integer field spans a different width class, the doc's REAL
  * text as the str field) under RFC 8949's deterministic-encoding
  * rules. Damage %7: 0 → truncation; 3 → a NON-CANONICAL WIDTH (the
  * "small" uint re-encoded at ai 26, value identical — only the
  * shortest-form rule objects); 5 → the first two map entries SWAPPED
  * (every byte intact — only the sorted-keys rule objects). */
object CborSim {
  import Cbor._

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
      "pi" -> VFloat((docId % 64) * 0.25),
      "flag" -> VBool(docId % 3 == 0),
      "blob" -> VBytes(blob)))
  }

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val clean = Cbor.encode(recordFor(docId, text))
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(clean, clean.length - 4)
      case 3 =>
        // re-encode the "small" value (a < 24 immediate, 1 byte) at
        // ai 26 (5 bytes). The offset is computed STRUCTURALLY — sum
        // the spans of the canonically-sorted entries before "small" —
        // not by byte search: a text value containing the ASCII
        // substring "esmall" would otherwise match first and the
        // damage would land inside the string, changing the damage
        // class this case advertises (non-canonical width only).
        val key = Cbor.encode(VStr("small"))
        val entries = recordFor(docId, text) match {
          case VMap(kvs) => kvs.map { case (k, v) =>
            (Cbor.encode(VStr(k)), Cbor.encode(v))
          }.sortWith((a, b) => Cbor.byteLt(a._1, b._1))
          case _ => sys.error("unreachable")
        }
        var at = 1 // 1-byte map head (12 < 24 entries)
        var i = 0
        while (!java.util.Arrays.equals(entries(i)._1, key)) {
          at += entries(i)._1.length + entries(i)._2.length; i += 1
        }
        at += key.length
        val v = clean(at) & 0xff // immediate uint byte (major 0)
        val out = new Array[Byte](clean.length + 4)
        System.arraycopy(clean, 0, out, 0, at)
        out(at) = 0x1a.toByte // major 0, ai 26
        out(at + 1) = 0; out(at + 2) = 0; out(at + 3) = 0
        out(at + 4) = v.toByte
        System.arraycopy(clean, at + 1, out, at + 5, clean.length - at - 1)
        out
      case 5 =>
        // swap the first two key/value pairs in place: every byte
        // intact, only the deterministic key order objects. The map
        // head is 1 byte (12 < 24 entries); entry spans are found by
        // re-encoding the first two pairs.
        val sorted = recordFor(docId, text) match {
          case VMap(kvs) => kvs.map { case (k, v) =>
            val o = new java.io.ByteArrayOutputStream()
            Cbor.encode(VStr(k)).foreach(o.write(_))
            o.write(Cbor.encode(v), 0, Cbor.encode(v).length)
            o.toByteArray
          }.sortWith((a, b) => Cbor.byteLt(a, b))
          case _ => sys.error("unreachable")
        }
        val a = sorted.head; val b2 = sorted(1)
        val out = new Array[Byte](clean.length)
        out(0) = clean(0) // map head
        System.arraycopy(b2, 0, out, 1, b2.length)
        System.arraycopy(a, 0, out, 1 + b2.length, a.length)
        System.arraycopy(clean, 1 + a.length + b2.length,
          out, 1 + a.length + b2.length,
          clean.length - 1 - a.length - b2.length)
        out
      case _ => clean
    }
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
            Cbor.decode(payloadFor(id, text)) match {
              case Some(VMap(kvs)) =>
                val m = kvs.toMap
                val blob = m("blob").asInstanceOf[VBytes].v
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
