package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TensorBoard event files (`tfevents`) — the training-telemetry
  * format every large run emits by the gigabyte (loss curves, eval
  * metrics: the logs a data-engine joins against its corpus to answer
  * "which shard mix trained better") — stacked entirely on in-repo
  * layers: the d107 TFRecord framing (length + masked-crc32c per
  * record) underneath, and a schema-exact protobuf walk (the d120
  * discipline) of the `Event` message on top:
  *
  *  - the VERSION HANDSHAKE: the first record must be an Event whose
  *    `file_version` (field 3) is exactly `brain.Event:2` — a reader
  *    that guesses at other versions misparses what follows, so any
  *    other value QUARANTINES;
  *  - scalar events: `wall_time` (field 1, fixed64 double), `step`
  *    (field 2, varint int64), `summary` (field 5) holding repeated
  *    `Summary.Value` records of `tag` (field 1) + `simple_value`
  *    (field 2, fixed32 float); any OTHER oneof member (images,
  *    histograms, tensors) and any unknown field quarantines — the
  *    walk is schema-exact, never a guess;
  *  - THE MONOTONICITY RULE: steps must be non-decreasing in file
  *    order (the writer subset — a backwards step is a spliced or
  *    corrupted log, and joining metrics on it silently misattributes
  *    results); duplicate tags within one summary quarantine.
  *
  * The TFRecord layer below is already interop-pinned (d107); the
  * Event layer is pinned by encode∘decode identity, the per-rule
  * rejection grid, and the closed-form oracle.
  */
object TfEventsCodec {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  final case class Scalar(tag: String, value: Float)
  final case class Event(wallTime: Double, step: Long, scalars: Seq[Scalar])

  // ---- wire primitives (the d120 shapes, local to this schema) -------

  private final class R(b: Array[Byte], var p: Int, val end: Int) {
    def hasMore: Boolean = p < end
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var i = 0
      while (i < 10) {
        if (p >= end) throw Malformed
        val x = b(p); p += 1
        v |= (x & 0x7FL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
        i += 1
      }
      throw Malformed
    }
    def sub(): R = {
      val len = varint()
      if (len < 0 || p + len > end) throw Malformed
      val r = new R(b, p, p + len.toInt)
      p += len.toInt
      r
    }
    def str(): String = {
      val len = varint()
      if (len < 0 || p + len > end) throw Malformed
      val s = CharsetSniff.decodeUtf8(b, p, p + len.toInt)
      p += len.toInt
      s
    }
    def fixed64(): Long = {
      if (p + 8 > end) throw Malformed
      var v = 0L
      var i = 0
      while (i < 8) { v |= (b(p + i) & 0xFFL) << (8 * i); i += 1 }
      p += 8
      v
    }
    def fixed32(): Int = {
      if (p + 4 > end) throw Malformed
      val v = (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8) |
        ((b(p + 2) & 0xFF) << 16) | ((b(p + 3) & 0xFF) << 24)
      p += 4
      v
    }
  }

  private final class W {
    val out = new java.io.ByteArrayOutputStream
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(f: Int, wire: Int): Unit = varint((f << 3) | wire)
    def fixed64(v: Long): Unit = {
      var i = 0
      while (i < 8) { out.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 }
    }
    def fixed32(v: Int): Unit = {
      var i = 0
      while (i < 4) { out.write((v >> (8 * i)) & 0xFF); i += 1 }
    }
    def lenDelim(f: Int, payload: Array[Byte]): Unit = {
      tag(f, 2); varint(payload.length.toLong)
      out.write(payload, 0, payload.length)
    }
  }

  // ------------------------------------------------------------ encode

  private def versionEventBytes(version: String): Array[Byte] = {
    val w = new W
    w.tag(1, 1); w.fixed64(java.lang.Double.doubleToLongBits(1700000000.0))
    w.lenDelim(3, version.getBytes("UTF-8"))
    w.out.toByteArray
  }

  private def scalarEventBytes(e: Event): Array[Byte] = {
    val w = new W
    w.tag(1, 1); w.fixed64(java.lang.Double.doubleToLongBits(e.wallTime))
    w.tag(2, 0); w.varint(e.step)
    val sm = new W
    e.scalars.foreach { s =>
      val v = new W
      v.lenDelim(1, s.tag.getBytes("UTF-8"))
      v.tag(2, 5); v.fixed32(java.lang.Float.floatToIntBits(s.value))
      sm.lenDelim(1, v.out.toByteArray)
    }
    w.lenDelim(5, sm.out.toByteArray)
    w.out.toByteArray
  }

  /** A tfevents shard: the version event then the scalar events,
    * through the d107 TFRecord layer. */
  private[graft] def encode(events: Seq[Event],
      version: String = "brain.Event:2"): Array[Byte] =
    TfRecordCodec.encode(versionEventBytes(version) +: events.map(scalarEventBytes))

  // ------------------------------------------------------------ decode

  private def parseEvent(b: Array[Byte]): (Double, Long, String, Seq[Scalar]) = {
    val r = new R(b, 0, b.length)
    var wallTime = 0.0
    var step = 0L
    var version: String = null
    var scalars = Seq.empty[Scalar]
    var sawSummary = false
    while (r.hasMore) {
      val key = r.varint()
      val field = (key >> 3).toInt
      val wire = (key & 7).toInt
      (field, wire) match {
        case (1, 1) => wallTime = java.lang.Double.longBitsToDouble(r.fixed64())
        case (2, 0) => step = r.varint()
        case (3, 2) =>
          if (version != null) throw Malformed
          version = r.str()
        case (5, 2) =>
          if (sawSummary) throw Malformed
          sawSummary = true
          val sm = r.sub()
          val out = Seq.newBuilder[Scalar]
          val seen = scala.collection.mutable.HashSet[String]()
          while (sm.hasMore) {
            val k2 = sm.varint()
            if ((k2 >> 3).toInt != 1 || (k2 & 7).toInt != 2) throw Malformed
            val v = sm.sub()
            var tag: String = null
            var value: Float = Float.NaN
            var sawValue = false
            while (v.hasMore) {
              val k3 = v.varint()
              ((k3 >> 3).toInt, (k3 & 7).toInt) match {
                case (1, 2) =>
                  if (tag != null) throw Malformed
                  tag = v.str()
                case (2, 5) =>
                  if (sawValue) throw Malformed
                  sawValue = true
                  value = java.lang.Float.intBitsToFloat(v.fixed32())
                case _ => throw Malformed // other oneof members: never guessed
              }
            }
            if (tag == null || !sawValue) throw Malformed
            if (!seen.add(tag)) throw Malformed // duplicate tag
            out += Scalar(tag, value)
          }
          scalars = out.result()
        case _ => throw Malformed // unknown Event fields: schema-exact
      }
    }
    (wallTime, step, version, scalars)
  }

  /** Strict decode → events (the version record consumed and checked). */
  def decode(b: Array[Byte]): Option[Seq[Event]] =
    try {
      val records = TfRecordCodec.decode(b).getOrElse(throw Malformed)
      if (records.isEmpty) throw Malformed
      val (_, _, version, headScalars) = parseEvent(records.head)
      // the handshake: exactly brain.Event:2, and no payload beside it
      if (version != "brain.Event:2" || headScalars.nonEmpty) throw Malformed
      var lastStep = Long.MinValue
      val events = records.tail.map { rec =>
        val (wt, step, v, scalars) = parseEvent(rec)
        if (v != null) throw Malformed // one version record, first
        if (step < lastStep) throw Malformed // the monotonicity rule
        lastStep = step
        Event(wt, step, scalars)
      }
      Some(events)
    } catch {
      case Malformed => None
      case _: Throwable => None
    }
}

/** In-plan synthesizer + gate for d152: each doc a training log of
  * E = 4 + doc_id%4 epochs, each logging `loss` (a decreasing quarter
  * grid) and `acc` at step 100·(e+1). Damage %7: 0 → truncation (the
  * TFRecord crc layer); 3 → a WRONG file_version (`brain.Event:1` —
  * every crc intact, only the handshake catches the log a guessing
  * reader would misparse); 5 → the last two epochs SWAPPED (every
  * record and crc intact — only the step-monotonicity rule catches
  * the spliced log). */
object TfEventsSim {
  import TfEventsCodec._

  private[graft] def epochs(docId: Long): Int = (4 + docId % 4).toInt

  private[graft] def loss(docId: Long, e: Int): Float =
    (((100 - e * 3) + docId % 7) * 0.25).toFloat
  private[graft] def acc(docId: Long, e: Int): Float =
    (((e * 5) + docId % 11) * 0.25).toFloat

  private[graft] def eventsFor(docId: Long): Seq[Event] =
    (0 until epochs(docId)).map { e =>
      Event(1700000000.0 + e, 100L * (e + 1),
        Seq(Scalar("loss", loss(docId, e)), Scalar("acc", acc(docId, e))))
    }

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val mode = docId % 7
    val evs0 = eventsFor(docId)
    val evs =
      if (mode == 5) {
        val n = evs0.size
        evs0.updated(n - 2, evs0(n - 1)).updated(n - 1, evs0(n - 2))
      } else evs0
    val clean = TfEventsCodec.encode(evs,
      version = if (mode == 3) "brain.Event:1" else "brain.Event:2")
    if (mode == 0) java.util.Arrays.copyOf(clean, clean.length - 5)
    else clean
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_events", LongType),
    StructField("n_scalars", LongType),
    StructField("last_step", LongType),
    StructField("final_loss", DoubleType),
    StructField("sum_acc", DoubleType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            TfEventsCodec.decode(payloadFor(id)) match {
              case Some(events) if events.nonEmpty =>
                var nScalars = 0L
                var sumAcc = 0.0
                var finalLoss = 0.0
                events.foreach { e =>
                  nScalars += e.scalars.size
                  e.scalars.foreach { s =>
                    if (s.tag == "acc") sumAcc += s.value
                    if (s.tag == "loss") finalLoss = s.value
                  }
                }
                Iterator.single(Row(id, events.size.toLong, nScalars,
                  events.last.step, finalLoss, sumAcc))
              case _ => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
