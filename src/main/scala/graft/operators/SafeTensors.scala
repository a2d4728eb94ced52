package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** safetensors — the tensor-weights format modern model and embedding
  * artifacts actually ship in (the safe replacement for pickle:
  * checkpoints, LoRA adapters, precomputed embedding shards) — from
  * the published specification (github.com/huggingface/safetensors),
  * BOTH directions:
  *
  *  - the framing: an 8-byte little-endian header length, a JSON
  *    header (parsed by d141's STRICT RFC 8259 parser — duplicate
  *    tensor names are rejected by the grammar itself; trailing
  *    space padding before the buffer is spec-legal and accepted),
  *    then the raw byte buffer;
  *  - per-tensor entries: `dtype` (the published table: F64/F32/F16/
  *    BF16/I64/I32/I16/I8/U8/BOOL — anything else quarantines, never
  *    guessed), `shape` (non-negative dims), `data_offsets` [begin,
  *    end) into the buffer; the optional `__metadata__` string map;
  *  - THE VALIDATION THE REFERENCE IMPLEMENTATION ENFORCES, enforced
  *    here: offsets sorted-by-begin must TILE the buffer exactly —
  *    begin 0, contiguous (no gaps, NO OVERLAPS — overlapping
  *    tensors are how a malicious file lies about its size), final
  *    end == buffer length — and every tensor's byte span must equal
  *    `product(shape) × dtype-size` (the shape-vs-bytes audit: a
  *    shape that lies about its data reads garbage as weights).
  *
  * No safetensors implementation exists in this container (stated
  * honestly): pinned by encode∘decode identity, the full
  * truncation sweep, and the closed-form oracle over exact-quarter
  * F32 grids.
  */
object SafeTensors {
  import DeltaJson._

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private val DTYPE_SIZE = Map("F64" -> 8, "F32" -> 4, "F16" -> 2,
    "BF16" -> 2, "I64" -> 8, "I32" -> 4, "I16" -> 2, "I8" -> 1,
    "U8" -> 1, "BOOL" -> 1)

  final case class Tensor(name: String, dtype: String, shape: Seq[Long],
      begin: Long, end: Long)

  /** Strict decode → (tensors in buffer order, buffer). */
  def decode(b: Array[Byte]): Option[(Seq[Tensor], Array[Byte])] =
    try {
      if (b.length < 8) throw Malformed
      var hlen = 0L
      var i = 0
      while (i < 8) { hlen |= (b(i) & 0xffL) << (8 * i); i += 1 }
      if (hlen <= 0 || hlen > 100000000 || 8 + hlen > b.length) throw Malformed
      val header = new String(b, 8, hlen.toInt, "UTF-8")
      val buffer = java.util.Arrays.copyOfRange(b, (8 + hlen).toInt, b.length)
      val root = obj(parse(header))
      val tensors = root.toSeq.collect {
        case (name, v) if name != "__metadata__" =>
          val t = obj(v)
          val dtype = str(t.getOrElse("dtype", throw Malformed))
          if (!DTYPE_SIZE.contains(dtype)) throw Malformed
          val shape = t.getOrElse("shape", throw Malformed) match {
            case JArr(xs) => xs.map {
              case JNum(n) if n >= 0 => n
              case _ => throw Malformed
            }
            case _ => throw Malformed
          }
          val offs = t.getOrElse("data_offsets", throw Malformed) match {
            case JArr(Seq(JNum(a), JNum(c))) => (a, c)
            case _ => throw Malformed
          }
          if (offs._1 < 0 || offs._2 < offs._1 ||
            offs._2 > buffer.length) throw Malformed
          // the shape-vs-bytes audit
          val elems = shape.foldLeft(1L)((a, d) => {
            val m = a * d
            if (d != 0 && m / d != a) throw Malformed // overflow
            m
          })
          if (offs._2 - offs._1 != elems * DTYPE_SIZE(dtype)) throw Malformed
          Tensor(name, dtype, shape, offs._1, offs._2)
      }
      root.get("__metadata__").foreach {
        case JObj(m) => m.values.foreach {
          case JStr(_) => ()
          case _ => throw Malformed
        }
        case _ => throw Malformed
      }
      // the reference validation: sorted by begin, tiling the buffer
      // exactly — no gaps, no overlaps
      val sorted = tensors.sortBy(_.begin)
      var expect = 0L
      sorted.foreach { t =>
        if (t.begin != expect) throw Malformed
        expect = t.end
      }
      if (expect != buffer.length) throw Malformed
      Some((sorted, buffer))
    } catch {
      case Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: Throwable => None
    }

  /** F32 values of one tensor (little-endian). */
  def f32(t: Tensor, buffer: Array[Byte]): Array[Float] = {
    if (t.dtype != "F32") throw Malformed
    val n = ((t.end - t.begin) / 4).toInt
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val p = (t.begin + 4L * i).toInt
      val bits = (buffer(p) & 0xff) | ((buffer(p + 1) & 0xff) << 8) |
        ((buffer(p + 2) & 0xff) << 16) | ((buffer(p + 3) & 0xff) << 24)
      out(i) = java.lang.Float.intBitsToFloat(bits)
      i += 1
    }
    out
  }

  /** Encode F32 tensors. The lie flags plant the %7 damage. */
  private[graft] def encode(tensors: Seq[(String, Seq[Long], Array[Float])],
      lieShape: Boolean = false, overlap: Boolean = false): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream
    var off = 0L
    val entries = tensors.zipWithIndex.map { case ((name, shape, vals), ti) =>
      val begin =
        if (overlap && ti == 1) off - 4 // bite into the previous tensor
        else off
      vals.foreach { v =>
        val bits = java.lang.Float.floatToIntBits(v)
        var k = 0
        while (k < 4) { buf.write((bits >> (8 * k)) & 0xff); k += 1 }
      }
      if (overlap && ti == 1) {
        // drop 4 buffer bytes so the total still "fits": every length
        // matches its shape, only the overlap rule can object
        off = begin + 4L * vals.length
      } else off += 4L * vals.length
      val declaredShape =
        if (lieShape && ti == tensors.size - 1)
          shape.updated(0, shape.head + 1) // one row more than the bytes
        else shape
      (name, declaredShape, begin, begin + 4L * vals.length)
    }
    val bufBytes0 = buf.toByteArray
    // the overlap damage removed 4 bytes of span accounting; the
    // buffer shrinks to keep the TILING valid, so only the overlap
    // rule can object. The lying shape keeps the TRUE span and buffer,
    // so the tiling holds and only the shape-vs-bytes audit can object.
    val finalBuf =
      if (overlap) java.util.Arrays.copyOf(bufBytes0, bufBytes0.length - 4)
      else bufBytes0
    val json = entries.map { case (name, shape, b0, e0) =>
      s""""$name":{"dtype":"F32","shape":[${shape.mkString(",")}],""" +
        s""""data_offsets":[$b0,$e0]}"""
    }.mkString("{", ",", "}")
    val jb = json.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream
    var k = 0
    while (k < 8) { out.write(((jb.length.toLong >> (8 * k)) & 0xff).toInt); k += 1 }
    out.write(jb, 0, jb.length)
    out.write(finalBuf, 0, finalBuf.length)
    out.toByteArray
  }
}

/** In-plan synthesizer + gate for d148: each doc an embedding shard of
  * K = 2 + doc_id%3 F32 tensors `emb_t` with shape [3+(doc_id+t)%4, 8]
  * and exact-quarter values ((doc_id + t*31 + r*8 + c) % 64) · 0.25.
  * Damage %7: 0 → truncation; 3 → a LYING SHAPE on the last tensor
  * (buffer and offsets adjusted so the tiling holds — only the
  * shape-vs-bytes audit catches a tensor that claims more rows than
  * its data); 5 → OVERLAPPING data_offsets (every length matches its
  * shape — only the no-overlap tiling rule catches it). */
object SafeTensorsSim {

  private[graft] def kTensors(docId: Long): Int = (2 + docId % 3).toInt
  private[graft] def rowsOf(docId: Long, t: Int): Int =
    (3 + (docId + t) % 4).toInt

  private[graft] def value(docId: Long, t: Int, r: Int, c: Int): Float =
    (((docId + t * 31 + r * 8 + c) % 64) * 0.25).toFloat

  private[graft] def tensorsFor(docId: Long)
      : Seq[(String, Seq[Long], Array[Float])] =
    (0 until kTensors(docId)).map { t =>
      val rows = rowsOf(docId, t)
      val vals = new Array[Float](rows * 8)
      var i = 0
      (0 until rows).foreach { r =>
        (0 until 8).foreach { c => vals(i) = value(docId, t, r, c); i += 1 }
      }
      (s"emb_$t", Seq(rows.toLong, 8L), vals)
    }

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val mode = docId % 7
    val clean = SafeTensors.encode(tensorsFor(docId),
      lieShape = mode == 3, overlap = mode == 5)
    if (mode == 0) java.util.Arrays.copyOf(clean, clean.length - 6)
    else clean
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_tensors", LongType),
    StructField("total_elems", LongType),
    StructField("sum_vals", DoubleType),
    StructField("max_val", DoubleType),
    StructField("data_bytes", LongType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            SafeTensors.decode(payloadFor(id)) match {
              case Some((tensors, buffer)) =>
                var elems = 0L
                var sum = 0.0
                var mx = Double.MinValue
                tensors.foreach { t =>
                  val vs = SafeTensors.f32(t, buffer)
                  elems += vs.length
                  vs.foreach { v => sum += v; if (v > mx) mx = v }
                }
                Iterator.single(Row(id, tensors.size.toLong, elems, sum,
                  mx, buffer.length.toLong))
              case None => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
