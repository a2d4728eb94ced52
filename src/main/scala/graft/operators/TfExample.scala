package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** tf.Example protobuf codec for the d120 gate — the PAYLOAD layer
  * d107 stops short of: a TFRecord shard's records are tf.Example
  * protocol-buffer messages (`Example → Features → map<string,
  * Feature> → BytesList | FloatList | Int64List`), and a training
  * pipeline that walks the framing but cannot read the features
  * hasn't ingested anything. The WIRE FORMAT is implemented HERE from
  * the published protobuf encoding spec — base-128 varints, zigzag,
  * (field<<3)|wiretype tags, length-delimited nesting, PACKED and
  * unpacked repeated primitives, 4-byte LE floats — in BOTH
  * directions. The independent interop twin is the real protobuf
  * runtime on the public Spark classpath (relocated as
  * `org.apache.orc.protobuf` inside orc-core-shaded-protobuf — the
  * lz4-java/zstd-jni precedent): `CodedOutputStream`-built messages
  * decode in our walker and our encoder's bytes re-parse tag-for-tag
  * under `CodedInputStream`, spec-pinned both ways.
  *
  * Scope (the d98 discipline): the tf.Example schema exactly — field
  * numbers {1} (Example.features), {1} (Features.feature map entry),
  * {1,2} (map key/value), {1,2,3} (Feature oneof), {1} (list
  * values); floats and int64s accepted packed OR unpacked (both are
  * legal encodings real writers emit); unknown fields, wiretype
  * mismatches, duplicate feature keys, more than one oneof member,
  * length overruns, non-terminating varints (>10 bytes) and trailing
  * bytes all QUARANTINE rather than crash.
  */
object TfExampleCodec {

  private object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** One parsed feature: exactly one of the three lists is set. */
  private[graft] final case class Feature(bytes: Seq[Array[Byte]],
                                          floats: Seq[Float],
                                          int64s: Seq[Long],
                                          kind: Int) // 1 bytes, 2 float, 3 int64

  // ---- wire primitives ------------------------------------------------

  private final class Reader(b: Array[Byte], var p: Int, val end: Int) {
    def hasMore: Boolean = p < end
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var i = 0
      while (i < 10) {
        if (p >= end) throw Malformed
        val byte = b(p); p += 1
        v |= (byte & 0x7FL) << shift
        if ((byte & 0x80) == 0) return v
        shift += 7
        i += 1
      }
      throw Malformed // varint longer than 10 bytes
    }
    def lenDelimited(): Reader = {
      val len = varint()
      if (len < 0 || p + len > end) throw Malformed
      val r = new Reader(b, p, p + len.toInt)
      p += len.toInt
      r
    }
    def bytesOut(): Array[Byte] = {
      val len = varint()
      if (len < 0 || p + len > end) throw Malformed
      val out = java.util.Arrays.copyOfRange(b, p, p + len.toInt)
      p += len.toInt
      out
    }
    def float32(): Float = {
      if (p + 4 > end) throw Malformed
      val bits = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
        ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
      p += 4
      java.lang.Float.intBitsToFloat(bits)
    }
  }

  private final class Writer {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def lenDelimited(field: Int, payload: Array[Byte]): Unit = {
      tag(field, 2); varint(payload.length.toLong)
      out.write(payload, 0, payload.length)
    }
    def bytes: Array[Byte] = out.toByteArray
  }

  // ---- tf.Example encode ----------------------------------------------

  private def encodeFeature(f: Feature): Array[Byte] = {
    val w = new Writer
    f.kind match {
      case 1 =>
        val bl = new Writer
        f.bytes.foreach(v => bl.lenDelimited(1, v))
        w.lenDelimited(1, bl.bytes)
      case 2 =>
        val fl = new Writer
        // packed (proto3 canonical): one length-delimited run of LE floats
        val payload = new Writer
        f.floats.foreach { v =>
          val bits = java.lang.Float.floatToIntBits(v)
          payload.out.write(bits & 0xFF); payload.out.write((bits >> 8) & 0xFF)
          payload.out.write((bits >> 16) & 0xFF); payload.out.write((bits >>> 24))
        }
        fl.lenDelimited(1, payload.bytes)
        w.lenDelimited(2, fl.bytes)
      case _ =>
        val il = new Writer
        val payload = new Writer
        f.int64s.foreach(payload.varint)
        il.lenDelimited(1, payload.bytes)
        w.lenDelimited(3, il.bytes)
    }
    w.bytes
  }

  /** Encode an Example from (key → Feature), keys in given order. */
  private[graft] def encode(features: Seq[(String, Feature)]): Array[Byte] = {
    val fm = new Writer
    features.foreach { case (k, f) =>
      val entry = new Writer
      entry.lenDelimited(1, k.getBytes("UTF-8"))
      entry.lenDelimited(2, encodeFeature(f))
      fm.lenDelimited(1, entry.bytes)
    }
    val ex = new Writer
    ex.lenDelimited(1, fm.bytes)
    ex.bytes
  }

  // ---- tf.Example decode ----------------------------------------------

  private def decodeFeature(r: Reader): Feature = {
    var kind = 0
    val bytesB = Seq.newBuilder[Array[Byte]]
    val floatsB = Seq.newBuilder[Float]
    val int64sB = Seq.newBuilder[Long]
    while (r.hasMore) {
      val tag = r.varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (kind != 0 && kind != field) throw Malformed // two oneof members
      field match {
        case 1 => // BytesList
          if (wire != 2) throw Malformed
          kind = 1
          val bl = r.lenDelimited()
          while (bl.hasMore) {
            val t2 = bl.varint()
            if (t2 != ((1 << 3) | 2)) throw Malformed
            bytesB += bl.bytesOut()
          }
        case 2 => // FloatList: packed or unpacked
          if (wire != 2) throw Malformed
          kind = 2
          val fl = r.lenDelimited()
          while (fl.hasMore) {
            val t2 = fl.varint()
            val f2 = (t2 >>> 3).toInt; val w2 = (t2 & 7).toInt
            if (f2 != 1) throw Malformed
            if (w2 == 2) { // packed run
              val run = fl.lenDelimited()
              if ((run.end - run.p) % 4 != 0) throw Malformed
              while (run.hasMore) floatsB += run.float32()
            } else if (w2 == 5) floatsB += fl.float32() // unpacked
            else throw Malformed
          }
        case 3 => // Int64List: packed or unpacked
          if (wire != 2) throw Malformed
          kind = 3
          val il = r.lenDelimited()
          while (il.hasMore) {
            val t2 = il.varint()
            val f2 = (t2 >>> 3).toInt; val w2 = (t2 & 7).toInt
            if (f2 != 1) throw Malformed
            if (w2 == 2) { // packed run
              val run = il.lenDelimited()
              while (run.hasMore) int64sB += run.varint()
            } else if (w2 == 0) int64sB += il.varint() // unpacked
            else throw Malformed
          }
        case _ => throw Malformed // unknown Feature field
      }
    }
    if (kind == 0) throw Malformed // empty feature
    Feature(bytesB.result(), floatsB.result(), int64sB.result(), kind)
  }

  /** STRICT Example decode → ordered (key, Feature) pairs, or None. */
  private[graft] def decode(b: Array[Byte]): Option[Seq[(String, Feature)]] =
    try {
      val r = new Reader(b, 0, b.length)
      var featuresSeen = false
      val out = Seq.newBuilder[(String, Feature)]
      val keys = scala.collection.mutable.HashSet.empty[String]
      while (r.hasMore) {
        val tag = r.varint()
        if (tag != ((1 << 3) | 2)) throw Malformed // only Example.features
        if (featuresSeen) throw Malformed // one Features message
        featuresSeen = true
        val fm = r.lenDelimited()
        while (fm.hasMore) {
          val t2 = fm.varint()
          if (t2 != ((1 << 3) | 2)) throw Malformed // map entries only
          val entry = fm.lenDelimited()
          var key: String = null
          var feat: Feature = null
          while (entry.hasMore) {
            val t3 = entry.varint()
            if (t3 == 0x0AL) { // field 1 wt 2: key
              if (key != null) throw Malformed
              key = new String(entry.bytesOut(), "UTF-8")
            } else if (t3 == 0x12L) { // field 2 wt 2: Feature
              if (feat != null) throw Malformed
              feat = decodeFeature(entry.lenDelimited())
            } else throw Malformed
          }
          if (key == null || feat == null) throw Malformed
          if (!keys.add(key)) throw Malformed // duplicate feature key
          out += (key -> feat)
        }
      }
      if (!featuresSeen) throw Malformed
      Some(out.result())
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }
}

/** d120 gate — the tf.Example layer over the REAL text inside d107's
  * TFRecord framing: each doc becomes a shard of K = 2 + doc_id%4
  * records, each a tf.Example with `id` (Int64List, doc_id*1000+i),
  * `text` (BytesList, the doc's i-th codepoint slice — the d113
  * slicing) and `emb` (FloatList, integer-valued closed-form floats —
  * engine-exact sums). Frames stay CLEAN (framing damage is d107's
  * audit); the d120 damage slice corrupts the PROTO GRAMMAR inside a
  * valid frame — doc_id%7: 0 → a wiretype-3 (group) tag, 3 → an
  * unknown field number, 5 → a nested length overrun — the
  * quarantine surface only a schema-aware walker can check (CRCs
  * pass: the frame is fine, the MESSAGE is not). */
object TfExampleSim {

  private[graft] def nRecords(docId: Long): Int = (2 + docId % 4).toInt

  private[graft] def embLen(docId: Long, i: Int): Int =
    (4 + (docId + i) % 5).toInt

  private[graft] def embVal(docId: Long, i: Int, k: Int): Int =
    ((docId * 5 + i * 11 + k * 3) % 256).toInt

  private[graft] def sliceTexts(docId: Long, text: String): Seq[String] = {
    val k = nRecords(docId)
    val cps = text.codePointCount(0, text.length)
    (0 until k).map { i =>
      val a = text.offsetByCodePoints(0, (i.toLong * cps / k).toInt)
      val b = text.offsetByCodePoints(0, ((i + 1).toLong * cps / k).toInt)
      text.substring(a, b)
    }
  }

  private[graft] def exampleFor(docId: Long, i: Int, slice: String): Array[Byte] =
    TfExampleCodec.encode(Seq(
      "id" -> TfExampleCodec.Feature(Nil, Nil, Seq(docId * 1000 + i), 3),
      "text" -> TfExampleCodec.Feature(Seq(slice.getBytes("UTF-8")), Nil, Nil, 1),
      "emb" -> TfExampleCodec.Feature(Nil,
        (0 until embLen(docId, i)).map(k => embVal(docId, i, k).toFloat), Nil, 2)))

  /** A grammatically-corrupt proto for the damage slice — framed in a
    * VALID TFRecord, so only the schema walk can quarantine it. */
  private def corruptExample(mode: Long, clean: Array[Byte]): Array[Byte] =
    mode match {
      case 0 => clean ++ Array[Byte](0x0B) // trailing wiretype-3 group tag
      case 3 => clean ++ Array[Byte](0x48, 0x01) // unknown field 9 varint
      case _ =>
        // nested length overrun: lie about the features length
        val d = clean.clone()
        // clean starts with tag 0x0A then a varint length; bump it
        d(1) = (d(1) + 1).toByte // lengths here are < 128 only for tiny
        if ((clean(1) & 0x80) != 0) clean ++ Array[Byte](0x0A, 0x7F)
        else d
    }

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val slices = sliceTexts(docId, text)
    val records = slices.zipWithIndex.map { case (s, i) =>
      exampleFor(docId, i, s)
    }
    val damaged = (docId % 7) match {
      case m @ (0L | 3L | 5L) =>
        records.updated(0, corruptExample(m, records.head))
      case _ => records
    }
    TfRecordCodec.encode(damaged)
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_records", LongType),
    StructField("sum_ids", LongType),
    StructField("text_bytes", LongType),
    StructField("emb_sum", LongType),
    StructField("roundtrip_ok", BooleanType)))

  /** Batched strict frame walk + proto parse → per-shard stats with
    * quarantine (a shard with ANY malformed message quarantines —
    * partial ingest of a corrupt shard is how silent data loss
    * happens). Map-only. */
  def stats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(statsSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val text = r.getString(1)
            val parsed = TfRecordCodec.decode(payloadFor(id, text)).flatMap {
              recs =>
                val exs = recs.map(TfExampleCodec.decode)
                if (exs.exists(_.isEmpty)) None else Some(exs.map(_.get))
            }
            parsed match {
              case Some(exs) =>
                var sumIds = 0L; var textBytes = 0L; var embSum = 0L
                val sb = new StringBuilder
                var ok = true
                exs.foreach { fs =>
                  val m = fs.toMap
                  if (m.size != 3 || !m.contains("id") ||
                    !m.contains("text") || !m.contains("emb")) ok = false
                  else {
                    sumIds += m("id").int64s.sum
                    val tb = m("text").bytes.head
                    textBytes += tb.length
                    sb.append(new String(tb, "UTF-8"))
                    embSum += m("emb").floats.map(_.toLong).sum
                  }
                }
                Row(id, "ok", exs.length.toLong, sumIds, textBytes, embSum,
                  java.lang.Boolean.valueOf(ok && sb.toString == text))
              case None =>
                Row(id, "quarantined", null, null, null, null, null)
            }
          }
        }
      }(enc)
  }
}
