package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Python pickle — the legacy serialization old dataset metadata and
  * index files still ship in (.pkl manifests, dataloader caches) and
  * the reason safetensors exists: `pickle.load` EXECUTES code. This
  * walker reads the DATA subset and REFUSES the executable surface —
  * implemented from the published opcode registry (pickletools is the
  * normative description), BOTH directions:
  *
  *  - protocols 2–5: PROTO, the protocol-4 FRAME layer (frame lengths
  *    must cover whole opcodes and tile the stream — a frame that
  *    lies quarantines), MEMOIZE/BINPUT and BINGET/LONG_BINGET with a
  *    STRICT memo discipline (a get from a never-filled slot
  *    quarantines), MARK with balanced stack shape, STOP leaving
  *    exactly one value and ENDING the stream (trailing bytes
  *    quarantine);
  *  - data opcodes: dicts (EMPTY_DICT / SETITEM / SETITEMS), lists
  *    (EMPTY_LIST / APPEND / APPENDS), tuples (TUPLE1/2/3, TUPLE,
  *    EMPTY_TUPLE), strings (SHORT_BINUNICODE / BINUNICODE — strict
  *    UTF-8 through d128), ints (BININT / BININT1 / BININT2 / LONG1),
  *    BINFLOAT (big-endian IEEE double), NONE, NEWTRUE / NEWFALSE;
  *  - THE REFUSAL SURFACE, the entire point: GLOBAL, STACK_GLOBAL,
  *    REDUCE, BUILD, INST, OBJ, NEWOBJ, NEWOBJ_EX, PERSID /
  *    BINPERSID, and the extension-registry opcodes all QUARANTINE —
  *    a reader that "just skips" an executable opcode has already
  *    mis-parsed the stream, and one that executes it is owned.
  *
  * Interop pinned BOTH directions against the real python pickle via
  * the CLI: `pickle.dumps` at protocols 2 AND 4 (frames, memoization
  * as python chooses) walks through this reader value-identical, and
  * this writer's streams `pickle.loads` back equal (PickleSpec).
  */
object PickleCodec {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  sealed trait P
  final case class PDict(items: Seq[(P, P)]) extends P
  final case class PList(items: Seq[P]) extends P
  final case class PTuple(items: Seq[P]) extends P
  final case class PStr(v: String) extends P
  final case class PInt(v: Long) extends P
  final case class PFloat(v: Double) extends P
  final case class PBool(v: Boolean) extends P
  case object PNone extends P

  private case object Mark

  /** Strict decode; None quarantines. */
  def decode(b: Array[Byte]): Option[P] =
    try {
      var p = 0
      var frameEnd = -1L // exclusive; -1 = no active frame
      def u8(): Int = {
        if (p >= b.length || (frameEnd >= 0 && p >= frameEnd)) throw Malformed
        val v = b(p) & 0xff; p += 1; v
      }
      def raw(n: Int): Array[Byte] = {
        if (n < 0 || p + n > b.length ||
          (frameEnd >= 0 && p + n > frameEnd)) throw Malformed
        val out = java.util.Arrays.copyOfRange(b, p, p + n)
        p += n
        out
      }
      def u32le(): Long = {
        val r = raw(4)
        (r(0) & 0xffL) | ((r(1) & 0xffL) << 8) | ((r(2) & 0xffL) << 16) |
          ((r(3) & 0xffL) << 24)
      }
      if (u8() != 0x80) throw Malformed // PROTO required (protocol 2+)
      val proto = u8()
      if (proto < 2 || proto > 5) throw Malformed
      val stack = scala.collection.mutable.ArrayBuffer[Any]()
      val memo = scala.collection.mutable.ArrayBuffer[P]()
      // BINPUT can target a sparse index, so unreached slots exist in
      // `memo` as placeholders — `filled` is the truth for the strict
      // "a get from a never-filled slot quarantines" discipline.
      val filled = scala.collection.mutable.BitSet()
      def memoPut(idx: Int, v: P): Unit = {
        while (memo.size <= idx) memo += PNone
        memo(idx) = v
        filled += idx
      }
      def memoGet(idx: Int): P = {
        if (!filled.contains(idx)) throw Malformed // never-filled slot
        memo(idx)
      }
      def popP(): P = {
        if (stack.isEmpty) throw Malformed
        stack.remove(stack.size - 1) match {
          case v: P => v
          case _ => throw Malformed // Mark where a value was needed
        }
      }
      def popToMark(): Seq[P] = {
        val items = Seq.newBuilder[P]
        val tmp = scala.collection.mutable.ArrayBuffer[P]()
        var done = false
        while (!done) {
          if (stack.isEmpty) throw Malformed
          stack.remove(stack.size - 1) match {
            case Mark => done = true
            case v: P => tmp += v
            case _ => throw Malformed
          }
        }
        tmp.reverse.foreach(items += _)
        items.result()
      }
      var result: P = null
      while (result == null) {
        if (frameEnd >= 0 && p == frameEnd) frameEnd = -1 // frame done
        val op = u8()
        op match {
          case 0x95 => // FRAME (protocol 4+)
            if (proto < 4 || frameEnd >= 0) throw Malformed
            // the length field itself is OUTSIDE the frame
            var len = 0L
            val r = raw(8)
            var i = 0
            while (i < 8) { len |= (r(i) & 0xffL) << (8 * i); i += 1 }
            if (len <= 0 || p + len > b.length) throw Malformed // a frame that lies
            frameEnd = p + len
          case '}' => stack += PDict(Seq.empty)
          case ']' => stack += PList(Seq.empty)
          case ')' => stack += PTuple(Seq.empty)
          case '(' => stack += Mark
          case 's' => // SETITEM
            val v = popP(); val k = popP()
            popP() match {
              case PDict(items) => stack += PDict(items :+ ((k, v)))
              case _ => throw Malformed
            }
          case 'u' => // SETITEMS
            val kvs = popToMark()
            if (kvs.size % 2 != 0) throw Malformed
            popP() match {
              case PDict(items) =>
                stack += PDict(items ++ kvs.grouped(2).map(g => (g(0), g(1))))
              case _ => throw Malformed
            }
          case 'a' => // APPEND
            val v = popP()
            popP() match {
              case PList(items) => stack += PList(items :+ v)
              case _ => throw Malformed
            }
          case 'e' => // APPENDS
            val vs = popToMark()
            popP() match {
              case PList(items) => stack += PList(items ++ vs)
              case _ => throw Malformed
            }
          case 0x85 => stack += PTuple(Seq(popP()))
          case 0x86 =>
            val b2 = popP(); val a = popP()
            stack += PTuple(Seq(a, b2))
          case 0x87 =>
            val c = popP(); val b2 = popP(); val a = popP()
            stack += PTuple(Seq(a, b2, c))
          case 't' => stack += PTuple(popToMark())
          case 0x8c => // SHORT_BINUNICODE
            val n = u8()
            val r = raw(n)
            stack += PStr(CharsetSniff.decodeUtf8(r, 0, r.length))
          case 'X' => // BINUNICODE
            val n = u32le()
            if (n > (1L << 24)) throw Malformed
            val r = raw(n.toInt)
            stack += PStr(CharsetSniff.decodeUtf8(r, 0, r.length))
          case 'K' => stack += PInt(u8().toLong)
          case 'M' =>
            val r = raw(2)
            stack += PInt(((r(0) & 0xffL) | ((r(1) & 0xffL) << 8)))
          case 'J' =>
            stack += PInt(u32le().toInt.toLong) // signed 32
          case 0x8a => // LONG1
            val n = u8()
            if (n == 0) stack += PInt(0L)
            else {
              if (n > 8) throw Malformed // bigints out of scope
              val r = raw(n)
              var v = 0L
              var i = 0
              while (i < n) { v |= (r(i) & 0xffL) << (8 * i); i += 1 }
              // sign-extend from the top byte
              val shift = 64 - 8 * n
              stack += PInt((v << shift) >> shift)
            }
          case 'G' => // BINFLOAT: big-endian double
            val r = raw(8)
            var bits = 0L
            var i = 0
            while (i < 8) { bits = (bits << 8) | (r(i) & 0xffL); i += 1 }
            stack += PFloat(java.lang.Double.longBitsToDouble(bits))
          case 0x88 => stack += PBool(true)
          case 0x89 => stack += PBool(false)
          case 'N' => stack += PNone
          case 0x94 => // MEMOIZE
            stack.lastOption match {
              case Some(v: P) => memoPut(memo.size, v)
              case _ => throw Malformed
            }
          case 'q' => // BINPUT idx(1): protocol-2 memoization
            val idx = u8()
            stack.lastOption match {
              case Some(v: P) => memoPut(idx, v)
              case _ => throw Malformed
            }
          case 'r' => // LONG_BINPUT idx(4)
            val idx = u32le()
            if (idx > (1 << 20)) throw Malformed
            stack.lastOption match {
              case Some(v: P) => memoPut(idx.toInt, v)
              case _ => throw Malformed
            }
          case 'h' => // BINGET
            stack += memoGet(u8())
          case 'j' => // LONG_BINGET
            val idx = u32le()
            if (idx > (1 << 20)) throw Malformed
            stack += memoGet(idx.toInt)
          case '.' => // STOP
            if (frameEnd >= 0 && p != frameEnd) throw Malformed // frame lies
            val v = popP()
            if (stack.nonEmpty) throw Malformed // exactly one value
            if (p != b.length) throw Malformed // trailing bytes
            result = v
          // ---- the refusal surface: executable opcodes -------------
          case 'c' | 'R' | 'b' | 'i' | 'o' | 'P' | 'Q' =>
            throw Malformed // GLOBAL/REDUCE/BUILD/INST/OBJ/PERSID
          case 0x93 | 0x81 | 0x92 => throw Malformed // STACK_GLOBAL/NEWOBJ(_EX)
          case 0x82 | 0x83 | 0x84 => throw Malformed // EXT1/2/4
          case _ => throw Malformed // anything unregistered: never guessed
        }
      }
      Some(result)
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: Throwable => None
    }

  /** Encode the data subset at protocol 2 (loads under any python). */
  private[graft] def encode(v: P): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    out.write(0x80); out.write(2)
    def emit(x: P): Unit = x match {
      case PDict(items) =>
        out.write('}')
        if (items.nonEmpty) {
          out.write('(')
          items.foreach { case (k, w) => emit(k); emit(w) }
          out.write('u')
        }
      case PList(items) =>
        out.write(']')
        if (items.nonEmpty) {
          out.write('(')
          items.foreach(emit)
          out.write('e')
        }
      case PTuple(items) =>
        items.size match {
          case 0 => out.write(')')
          case 1 => emit(items.head); out.write(0x85)
          case 2 => items.foreach(emit); out.write(0x86)
          case 3 => items.foreach(emit); out.write(0x87)
          case _ =>
            out.write('(')
            items.foreach(emit)
            out.write('t')
        }
      case PStr(s) =>
        val sb = s.getBytes("UTF-8")
        out.write('X')
        var i = 0
        while (i < 4) { out.write((sb.length >> (8 * i)) & 0xff); i += 1 }
        out.write(sb, 0, sb.length)
      case PInt(n) =>
        if (n >= 0 && n < 256) { out.write('K'); out.write(n.toInt) }
        else if (n >= 0 && n < 65536) {
          out.write('M'); out.write((n & 0xff).toInt)
          out.write(((n >> 8) & 0xff).toInt)
        } else if (n >= Int.MinValue && n <= Int.MaxValue) {
          out.write('J')
          var i = 0
          while (i < 4) { out.write(((n >> (8 * i)) & 0xff).toInt); i += 1 }
        } else {
          out.write(0x8a); out.write(8)
          var i = 0
          while (i < 8) { out.write(((n >> (8 * i)) & 0xff).toInt); i += 1 }
        }
      case PFloat(d) =>
        out.write('G')
        val bits = java.lang.Double.doubleToLongBits(d)
        var i = 7
        while (i >= 0) { out.write(((bits >> (8 * i)) & 0xff).toInt); i -= 1 }
      case PBool(true) => out.write(0x88)
      case PBool(false) => out.write(0x89)
      case PNone => out.write('N')
    }
    emit(v)
    out.write('.')
    out.toByteArray
  }
}

/** In-plan synthesizer + gate for d150: each doc a .pkl metadata
  * record — {"id", "split", "score", "tokens": [K ints], "flags":
  * (bool, None)} — encoded at protocol 2, decoded back through the
  * refusing walker. Damage %7: 0 → truncation; 3 → a GLOBAL opcode
  * spliced over a value (every byte before and after well-formed —
  * the stream now asks the reader to import code, and the refusal
  * surface is the only thing that objects); 5 → a BINGET from a memo
  * slot never filled (the memo discipline). */
object PickleSim {
  import PickleCodec._

  private[graft] def k(docId: Long): Int = (5 + docId % 6).toInt
  private[graft] def token(docId: Long, i: Int): Long =
    (docId * 3 + i.toLong * i) % 1000
  private[graft] def split(docId: Long): String =
    if (docId % 5 == 0) "val" else "train"
  private[graft] def score(docId: Long): Double = (docId % 37) * 0.25

  private[graft] def valueFor(docId: Long): P =
    PDict(Seq(
      PStr("id") -> PInt(docId),
      PStr("split") -> PStr(split(docId)),
      PStr("score") -> PFloat(score(docId)),
      PStr("tokens") -> PList((0 until k(docId)).map(i =>
        PInt(token(docId, i)))),
      PStr("flags") -> PTuple(Seq(PBool(docId % 2 == 0), PNone))))

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val mode = docId % 7
    val clean = PickleCodec.encode(valueFor(docId))
    mode match {
      case 0 => java.util.Arrays.copyOf(clean, clean.length - 4)
      case 3 =>
        // overwrite the score's BINFLOAT opcode with GLOBAL — located
        // by its full 9-byte pattern ('G' + the big-endian bits), which
        // cannot occur earlier in this stream by construction. Every
        // byte before and after stays intact; the stream now asks the
        // reader to import code, and only the refusal surface objects
        val d = clean.clone()
        val bits = java.lang.Double.doubleToLongBits(score(docId))
        val pat = new Array[Byte](9)
        pat(0) = 'G'.toByte
        (0 until 8).foreach(i => pat(i + 1) = ((bits >> (8 * (7 - i))) & 0xff).toByte)
        val at = d.indices.indexWhere(i => i + 9 <= d.length &&
          (0 until 9).forall(j => d(i + j) == pat(j)))
        d(at) = 'c'.toByte
        d
      case 5 =>
        // replace the final '.' with a BINGET from an empty memo + '.'
        val d = java.util.Arrays.copyOf(clean, clean.length + 2)
        d(d.length - 3) = 'h'.toByte
        d(d.length - 2) = 7 // slot never filled
        d(d.length - 1) = '.'.toByte
        d
      case _ => clean
    }
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_keys", LongType),
    StructField("n_tokens", LongType),
    StructField("sum_tokens", LongType),
    StructField("score", DoubleType),
    StructField("split", StringType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            PickleCodec.decode(payloadFor(id)) match {
              case Some(PDict(items)) =>
                val m = items.collect { case (PStr(kk), v) => kk -> v }.toMap
                (m.get("tokens"), m.get("score"), m.get("split")) match {
                  case (Some(PList(ts)), Some(PFloat(sc)), Some(PStr(sp))) =>
                    val tokens = ts.collect { case PInt(t) => t }
                    if (tokens.size != ts.size) Iterator.empty
                    else Iterator.single(Row(id, items.size.toLong,
                      tokens.size.toLong, tokens.sum, sc, sp))
                  case _ => Iterator.empty
                }
              case _ => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
