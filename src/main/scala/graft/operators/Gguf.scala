package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** GGUF — the single-file model-weights format the llama.cpp
  * ecosystem distributes quantized checkpoints in (the d148
  * safetensors row's QUANTIZED sibling: a training-data platform that
  * scores corpora with local models ingests these by the thousand) —
  * from the published specification (ggml's docs/gguf.md), BOTH
  * directions:
  *
  *  - the framing: `GGUF` magic, u32 version (2 and 3 accepted — v3
  *    only adds the big-endian variant, and little-endian is the
  *    interchange default this walker scopes to), u64 tensor count,
  *    u64 metadata-kv count;
  *  - typed metadata: length-prefixed UTF-8 keys, a u32 value type
  *    from the published table (u8/i8/u16/i16/u32/i32/f32/bool/
  *    string/array/u64/i64/f64), arrays carrying their element type
  *    and u64 count (arrays of arrays are out of scope and
  *    quarantine, never guessed); a BOOL byte must be 0 or 1; KEYS
  *    MUST BE UNIQUE — the d153 discipline: a duplicate key makes
  *    the file mean two things to two readers;
  *  - `general.alignment` (u32, power of two, default 32) governs
  *    both the data-section start and every tensor offset;
  *  - tensor infos: unique names, n_dims ≤ 4 (GGML_MAX_DIMS), u64
  *    dims, a ggml type from the scoped table — F32 (4 B/elem),
  *    F16 (2 B/elem), Q8_0 (block of 32 elems = fp16 scale + 32
  *    int8 quants, 34 B) — element counts must be whole blocks;
  *  - THE TILING AUDIT: tensor offsets are relative to the aligned
  *    data-section start, each must be alignment-aligned, and sorted
  *    by offset they must tile the section exactly — first at 0,
  *    each next at align(prev end), inter-tensor padding bytes ZERO,
  *    the file ending at the last tensor's end. A lying offset is
  *    how a malicious file reads one tensor's bytes as another's.
  *
  * No GGUF implementation exists in this container (stated
  * honestly, the d153 discipline): pinned by encode∘decode identity,
  * the damage grid (truncation sweep, lying offset, duplicate key),
  * and a closed-form oracle over exact-quarter F32 grids, half-
  * representable F16 values and integer Q8_0 quants. */
object Gguf {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ggml tensor types in scope: id -> (bytes per block, elems per block)
  private[operators] val T_F32 = 0
  private[operators] val T_F16 = 1
  private[operators] val T_Q8_0 = 8
  private val TYPE_BLOCK: Map[Int, (Int, Int)] =
    Map(T_F32 -> (4, 1), T_F16 -> (2, 1), T_Q8_0 -> (34, 32))

  // metadata value-type ids (gguf.md enum)
  private val M_U8 = 0; private val M_I8 = 1; private val M_U16 = 2
  private val M_I16 = 3; private val M_U32 = 4; private val M_I32 = 5
  private val M_F32 = 6; private val M_BOOL = 7; private val M_STR = 8
  private val M_ARR = 9; private val M_U64 = 10; private val M_I64 = 11
  private val M_F64 = 12

  /** IEEE 754 binary16 → float (JDK 17 predates Float.float16ToFloat). */
  private[graft] def f16ToFloat(h: Int): Float = {
    val sign = (h >> 15) & 1
    val exp = (h >> 10) & 0x1f
    val frac = h & 0x3ff
    val f =
      if (exp == 0) math.pow(2, -14) * (frac / 1024.0)
      else if (exp == 0x1f) {
        if (frac == 0) Double.PositiveInfinity else Double.NaN
      } else math.pow(2, exp - 15) * (1.0 + frac / 1024.0)
    (if (sign == 1) -f else f).toFloat
  }

  /** float → binary16 bits, exact-representable inputs only (the sim
    * uses halves and quarters) — lossy inputs round to nearest-even. */
  private[graft] def floatToF16(v: Float): Int = {
    val bits = java.lang.Float.floatToIntBits(v)
    val sign = (bits >>> 16) & 0x8000
    val absBits = bits & 0x7fffffff
    if (absBits >= 0x47800000) return sign | 0x7c00 // overflow → inf
    if (absBits < 0x38800000) { // subnormal half
      val mant = (absBits & 0x7fffff) | 0x800000
      val shift = 126 - (absBits >>> 23) + 11
      if (shift > 24) return sign
      return sign | ((mant >> shift) + ((mant >> (shift - 1)) & 1))
    }
    val exp = ((absBits >>> 23) - 112) << 10
    val mant = (absBits >> 13) & 0x3ff
    val rounded = (sign | exp | mant) + ((absBits >> 12) & 1)
    rounded
  }

  sealed trait MValue
  final case class MInt(v: Long) extends MValue
  final case class MFloat(v: Double) extends MValue
  final case class MBool(v: Boolean) extends MValue
  final case class MStr(v: String) extends MValue
  final case class MArr(elems: Seq[MValue]) extends MValue

  final case class TensorInfo(name: String, dims: Seq[Long], tpe: Int,
      offset: Long) {
    def elems: Long = dims.product
    def byteSize: Long = {
      val (bb, be) = TYPE_BLOCK(tpe)
      (elems / be) * bb
    }
  }
  final case class Model(kv: Seq[(String, MValue)], tensors: Seq[TensorInfo],
      data: Array[Byte], alignment: Int)

  private class Reader(b: Array[Byte]) {
    var p = 0
    def need(n: Long): Unit =
      if (n < 0 || p + n > b.length) throw Malformed
    def u8(): Int = { need(1); val v = b(p) & 0xff; p += 1; v }
    def u16(): Int = { need(2); val v = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8); p += 2; v }
    def u32(): Long = { need(4)
      var v = 0L; var i = 0
      while (i < 4) { v |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
      p += 4; v }
    def u64(): Long = { need(8)
      var v = 0L; var i = 0
      while (i < 8) { v |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
      p += 8; v }
    def str(): String = {
      val n = u64()
      if (n < 0 || n > (1 << 20)) throw Malformed
      need(n)
      val s = new String(b, p, n.toInt, "UTF-8")
      p += n.toInt
      s
    }
  }

  private def readValue(r: Reader, tpe: Int, allowArr: Boolean): MValue =
    tpe match {
      case M_U8 => MInt(r.u8())
      case M_I8 => MInt(r.u8().toByte.toLong)
      case M_U16 => MInt(r.u16())
      case M_I16 => MInt(r.u16().toShort.toLong)
      case M_U32 => MInt(r.u32())
      case M_I32 => MInt(r.u32().toInt.toLong)
      case M_F32 => MFloat(java.lang.Float.intBitsToFloat(r.u32().toInt).toDouble)
      case M_BOOL =>
        val v = r.u8()
        if (v > 1) throw Malformed // a bool byte is 0 or 1, nothing else
        MBool(v == 1)
      case M_STR => MStr(r.str())
      case M_U64 => MInt(r.u64())
      case M_I64 => MInt(r.u64())
      case M_F64 => MFloat(java.lang.Double.longBitsToDouble(r.u64()))
      case M_ARR =>
        if (!allowArr) throw Malformed // nested arrays out of scope
        val et = r.u32().toInt
        val n = r.u64()
        if (n < 0 || n > (1 << 20)) throw Malformed
        MArr((0L until n).map(_ => readValue(r, et, allowArr = false)))
      case _ => throw Malformed
    }

  /** Strict decode. */
  def decode(b: Array[Byte]): Option[Model] =
    try {
      val r = new Reader(b)
      if (r.u8() != 'G' || r.u8() != 'G' || r.u8() != 'U' || r.u8() != 'F')
        throw Malformed
      val version = r.u32()
      if (version != 2 && version != 3) throw Malformed
      val nTensors = r.u64()
      val nKv = r.u64()
      if (nTensors < 0 || nTensors > 100000 || nKv < 0 || nKv > 100000)
        throw Malformed
      val seenKeys = scala.collection.mutable.HashSet.empty[String]
      val kv = (0L until nKv).map { _ =>
        val k = r.str()
        if (!seenKeys.add(k)) throw Malformed // unique keys
        k -> readValue(r, r.u32().toInt, allowArr = true)
      }
      val alignment = kv.collectFirst {
        case ("general.alignment", MInt(a)) => a
      }.getOrElse(32L)
      if (alignment <= 0 || (alignment & (alignment - 1)) != 0 ||
        alignment > (1 << 20)) throw Malformed
      val seenNames = scala.collection.mutable.HashSet.empty[String]
      val tensors = (0L until nTensors).map { _ =>
        val name = r.str()
        if (!seenNames.add(name)) throw Malformed // unique tensor names
        val nd = r.u32()
        if (nd < 1 || nd > 4) throw Malformed // GGML_MAX_DIMS
        val dims = (0L until nd).map { _ =>
          val d = r.u64()
          if (d <= 0 || d > (1L << 32)) throw Malformed
          d
        }
        val tpe = r.u32().toInt
        val (_, be) = TYPE_BLOCK.getOrElse(tpe, throw Malformed)
        // overflow-checked element count (the d148 audit): a dim
        // product that wraps Long would alias a huge tensor to a
        // small byte size and sail through the tiling
        val elems = dims.foldLeft(1L) { (a, d) =>
          val m = a * d
          if (m / d != a || m > (1L << 40)) throw Malformed
          m
        }
        val t = TensorInfo(name, dims, tpe, r.u64())
        if (elems % be != 0) throw Malformed // whole blocks only
        if (t.offset % alignment != 0) throw Malformed
        t
      }
      // data section starts at the aligned header end; padding zero
      val dataStart = ((r.p + alignment - 1) / alignment) * alignment
      if (dataStart > b.length) throw Malformed
      var q = r.p
      while (q < dataStart) {
        if (b(q) != 0) throw Malformed
        q += 1
      }
      // tiling: sorted by offset, first at 0, each next at the aligned
      // end of the previous (zero padding between), file ends at the
      // last tensor's end
      val sorted = tensors.sortBy(_.offset)
      var expect = 0L
      sorted.foreach { t =>
        if (t.offset != expect) throw Malformed
        val end = t.offset + t.byteSize
        expect = ((end + alignment - 1) / alignment) * alignment
        if (dataStart + end > b.length) throw Malformed
        // inter-tensor pad bytes must be zero (they are part of no
        // tensor; nonzero bytes there are smuggled payload)
        var z = dataStart + end
        val padEnd = math.min(dataStart + expect, b.length.toLong)
        while (z < padEnd) {
          if (b(z.toInt) != 0) throw Malformed
          z += 1
        }
      }
      val lastEnd = sorted.lastOption.map(t => t.offset + t.byteSize)
        .getOrElse(0L)
      if (dataStart + lastEnd != b.length) throw Malformed
      val data = java.util.Arrays.copyOfRange(b, dataStart.toInt, b.length)
      Some(Model(kv, tensors, data, alignment.toInt))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  /** F32 tensor values. */
  def f32(t: TensorInfo, data: Array[Byte]): Array[Float] = {
    require(t.tpe == T_F32)
    val n = t.elems.toInt
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val p = (t.offset + 4L * i).toInt
      val bits = (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8) |
        ((data(p + 2) & 0xff) << 16) | ((data(p + 3) & 0xff) << 24)
      out(i) = java.lang.Float.intBitsToFloat(bits)
      i += 1
    }
    out
  }

  /** F16 tensor values. */
  def f16(t: TensorInfo, data: Array[Byte]): Array[Float] = {
    require(t.tpe == T_F16)
    val n = t.elems.toInt
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val p = (t.offset + 2L * i).toInt
      out(i) = f16ToFloat((data(p) & 0xff) | ((data(p + 1) & 0xff) << 8))
      i += 1
    }
    out
  }

  /** Q8_0 blocks → (scales, int8 quants). */
  def q8Blocks(t: TensorInfo, data: Array[Byte]): (Array[Float], Array[Byte]) = {
    require(t.tpe == T_Q8_0)
    val nb = (t.elems / 32).toInt
    val scales = new Array[Float](nb)
    val quants = new Array[Byte](nb * 32)
    var bI = 0
    while (bI < nb) {
      val p = (t.offset + 34L * bI).toInt
      scales(bI) = f16ToFloat((data(p) & 0xff) | ((data(p + 1) & 0xff) << 8))
      System.arraycopy(data, p + 2, quants, bI * 32, 32)
      bI += 1
    }
    (scales, quants)
  }

  // ---- encoder ------------------------------------------------------

  final case class WTensor(name: String, dims: Seq[Long], tpe: Int,
      payload: Array[Byte])

  private def wstr(o: java.io.ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes("UTF-8")
    w64(o, b.length.toLong)
    o.write(b, 0, b.length)
  }
  private def w32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 4) { o.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }
  private def w64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { o.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def writeValue(o: java.io.ByteArrayOutputStream, v: MValue): Unit =
    v match {
      case MInt(x) => w64(o, x) // written as u64 (type id chosen by caller)
      case MFloat(x) => w32(o, java.lang.Float.floatToIntBits(x.toFloat) & 0xffffffffL)
      case MBool(x) => o.write(if (x) 1 else 0)
      case MStr(s) => wstr(o, s)
      case MArr(_) => throw Malformed // handled by caller
    }

  /** Encode a model. Metadata values are written with these type ids:
    * MInt → u64 (except `general.alignment` → u32, the type gguf.md
    * pins and llama.cpp type-checks), MFloat → f32, MBool, MStr,
    * MArr of MStr. `lieOffset`
    * bumps the LAST tensor's declared offset one alignment step (data
    * untouched — only the tiling audit objects); `dupKey` repeats the
    * first kv pair verbatim (both values intact — only the uniqueness
    * rule objects). */
  private[graft] def encode(kv: Seq[(String, MValue)], tensors: Seq[WTensor],
      alignment: Int = 32, lieOffset: Boolean = false,
      dupKey: Boolean = false): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream
    o.write('G'); o.write('G'); o.write('U'); o.write('F')
    w32(o, 3L)
    w64(o, tensors.length.toLong)
    val allKv = if (dupKey) kv.take(1) ++ kv else kv
    w64(o, allKv.length.toLong)
    allKv.foreach { case (k, v) =>
      wstr(o, k)
      v match {
        // gguf.md pins general.alignment as uint32 and real readers
        // (llama.cpp's loader) type-check it — emitting it as u64
        // would round-trip through OUR lenient decoder but not
        // interop (r14 advice)
        case MInt(x) if k == "general.alignment" =>
          w32(o, 4L); w32(o, x)
        case MInt(_) => w32(o, 10L); writeValue(o, v)
        case MFloat(_) => w32(o, 6L); writeValue(o, v)
        case MBool(_) => w32(o, 7L); writeValue(o, v)
        case MStr(_) => w32(o, 8L); writeValue(o, v)
        case MArr(es) =>
          w32(o, 9L); w32(o, 8L); w64(o, es.length.toLong)
          es.foreach(writeValue(o, _))
      }
    }
    // tensor infos with tiled offsets
    var off = 0L
    val offsets = tensors.map { t =>
      val mine = off
      val end = mine + t.payload.length
      off = ((end + alignment - 1) / alignment) * alignment
      mine
    }
    tensors.zip(offsets).zipWithIndex.foreach { case ((t, tOff), i) =>
      wstr(o, t.name)
      w32(o, t.dims.length.toLong)
      t.dims.foreach(w64(o, _))
      w32(o, t.tpe.toLong)
      val declared =
        if (lieOffset && i == tensors.length - 1) tOff + alignment
        else tOff
      w64(o, declared)
    }
    while (o.size() % alignment != 0) o.write(0)
    tensors.zip(offsets).zipWithIndex.foreach { case ((t, tOff), i) =>
      o.write(t.payload, 0, t.payload.length)
      // zero pad to the next tensor's aligned offset (never after the
      // last one — the file ends at its final byte)
      if (i < tensors.length - 1) {
        val end = tOff + t.payload.length
        var z = end
        val next = ((end + alignment - 1) / alignment) * alignment
        while (z < next) { o.write(0); z += 1 }
      }
    }
    o.toByteArray
  }
}

/** In-plan synthesizer + gate for d159: each doc becomes a GGUF
  * checkpoint shard with 6 typed metadata entries (architecture,
  * name, alignment, the doc's REAL n_chars from the table, a bool
  * flag, a string array) and K = 1 + doc_id%3 tensors whose type
  * rotates F32 / F16 / Q8_0 with (doc_id + t) % 3:
  *
  *  - F32 `w_t`: [2 + (doc_id + 2t)%4, 8], exact quarters
  *    ((doc_id + 31t + i) % 64)·0.25;
  *  - F16 `w_t`: [16], exact halves ((doc_id + t + i) % 32)·0.5;
  *  - Q8_0 `w_t`: [64] (two blocks), scale 0.5 (fp16-exact), quants
  *    ((7·doc_id + 13t + j) % 255) − 127.
  *
  * Damage %7: 0 → truncation; 3 → a LYING TENSOR OFFSET on the last
  * tensor, one alignment step high (all bytes intact — only the
  * tiling audit objects); 5 → a DUPLICATE metadata key (both values
  * intact — only the uniqueness rule objects). Damaged docs
  * contribute nothing (the d111 rule). */
object GgufSim {

  private[graft] def kTensors(docId: Long): Int = (1 + docId % 3).toInt

  private[graft] def tensorFor(docId: Long, t: Int): Gguf.WTensor = {
    val o = new java.io.ByteArrayOutputStream
    ((docId + t) % 3).toInt match {
      case 0 =>
        val rows = (2 + (docId + 2 * t) % 4).toInt
        val n = rows * 8
        (0 until n).foreach { i =>
          val bits = java.lang.Float.floatToIntBits(
            (((docId + t * 31 + i) % 64) * 0.25).toFloat)
          var k = 0
          while (k < 4) { o.write((bits >> (8 * k)) & 0xff); k += 1 }
        }
        Gguf.WTensor(s"w_$t", Seq(rows.toLong, 8L), Gguf.T_F32, o.toByteArray)
      case 1 =>
        (0 until 16).foreach { i =>
          val h = Gguf.floatToF16((((docId + t + i) % 32) * 0.5).toFloat)
          o.write(h & 0xff); o.write((h >> 8) & 0xff)
        }
        Gguf.WTensor(s"w_$t", Seq(16L), Gguf.T_F16, o.toByteArray)
      case _ =>
        val half = Gguf.floatToF16(0.5f)
        (0 until 2).foreach { blk =>
          o.write(half & 0xff); o.write((half >> 8) & 0xff)
          (0 until 32).foreach { jj =>
            val j = blk * 32 + jj
            o.write((((docId * 7 + t * 13 + j) % 255) - 127).toInt & 0xff)
          }
        }
        Gguf.WTensor(s"w_$t", Seq(64L), Gguf.T_Q8_0, o.toByteArray)
    }
  }

  private[graft] def payloadFor(docId: Long, nChars: Long): Array[Byte] = {
    import Gguf._
    val kv = Seq(
      "general.architecture" -> MStr("graft"),
      "general.name" -> MStr(s"doc$docId"),
      "general.alignment" -> MInt(32L),
      "doc.n_chars" -> MInt(nChars),
      "doc.flag" -> MBool(docId % 2 == 0),
      "doc.tags" -> MArr(Seq(MStr("corpus"), MStr(s"shard${docId % 5}"))))
    val tensors = (0 until kTensors(docId)).map(tensorFor(docId, _))
    val mode = docId % 7
    val clean = Gguf.encode(kv, tensors,
      lieOffset = mode == 3, dupKey = mode == 5)
    if (mode == 0) java.util.Arrays.copyOf(clean, clean.length - 6)
    else clean
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_kv", LongType),
    StructField("n_tensors", LongType),
    StructField("n_elems", LongType),
    StructField("sum_f32", DoubleType),
    StructField("sum_f16", DoubleType),
    StructField("sum_q", LongType),
    StructField("meta_n_chars", LongType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"), col("n_chars").cast("long"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val nChars = r.getLong(1)
            Gguf.decode(payloadFor(id, nChars)) match {
              case Some(m) =>
                var elems = 0L
                var sf32 = 0.0
                var sf16 = 0.0
                var sq = 0L
                m.tensors.foreach { t =>
                  elems += t.elems
                  t.tpe match {
                    case Gguf.T_F32 => Gguf.f32(t, m.data).foreach(sf32 += _)
                    case Gguf.T_F16 => Gguf.f16(t, m.data).foreach(sf16 += _)
                    case _ =>
                      val (_, qs) = Gguf.q8Blocks(t, m.data)
                      qs.foreach(sq += _)
                  }
                }
                val metaChars = m.kv.collectFirst {
                  case ("doc.n_chars", Gguf.MInt(v)) => v
                }.getOrElse(-1L)
                Iterator.single(Row(id, m.kv.size.toLong,
                  m.tensors.size.toLong, elems, sf32, sf16, sq, metaChars))
              case None => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
