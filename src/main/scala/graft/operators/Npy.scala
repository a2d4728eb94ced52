package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** NumPy `.npy` / `.npz` — the array interchange format half the ML
  * data world passes tensors around in (precomputed features,
  * embedding dumps, label arrays) — from the PUBLISHED format spec
  * (numpy NEP; lib/format.py is its normative description), BOTH
  * directions:
  *
  *  - `.npy` v1.0: the `\x93NUMPY` magic, version bytes, the 16-bit
  *    LE header length, and the header itself — a PYTHON DICT LITERAL
  *    (not JSON), parsed here with a strict grammar: exactly the keys
  *    `descr` / `fortran_order` / `shape`, single-quoted strings,
  *    True/False, tuple shapes incl. the 1-tuple trailing comma
  *    `(5,)` and the 0-d `()`, the mandatory trailing `\n`, space
  *    padding; the DATA must be exactly `product(shape) × itemsize`
  *    bytes (a count that disagrees with the shape quarantines —
  *    both directions of the lie);
  *  - dtypes in scope: `<f4 <f8 <i4 <i8 |u1 |i1` (anything else —
  *    big-endian, objects, structured records — quarantines, never
  *    guessed); `fortran_order: True` is outside the writer subset
  *    and quarantines;
  *  - `.npz`: a zip container of `.npy` members — walked by OUR d113
  *    zip codec (central directory, CRCs, the works), each member
  *    then held to the full `.npy` grammar.
  *
  * Interop pinned BOTH directions against REAL numpy 1.26 via the
  * python3 CLI (the sqlite3/GNU-tar/git precedent): `np.save`d and
  * `np.savez`d arrays — every in-scope dtype, 0-d/1-d/2-d shapes,
  * numpy's own 64-byte header padding — walk through this decoder
  * value-identical, and our writer's files `np.load` back with
  * matching dtype/shape/values (NpySpec).
  */
object NpyCodec {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private[graft] val ITEM = Map("<f4" -> 4, "<f8" -> 8, "<i4" -> 4,
    "<i8" -> 8, "|u1" -> 1, "|i1" -> 1)

  final case class NpyArray(descr: String, shape: Seq[Long],
      data: Array[Byte]) {
    def elems: Long = shape.foldLeft(1L)(_ * _)
  }

  // ------------------------------------------------------------ header

  /** Strict parse of the python dict literal header. */
  private[graft] def parseHeader(h: String): (String, Boolean, Seq[Long]) = {
    var i = 0
    def ws(): Unit = while (i < h.length && h(i) == ' ') i += 1
    def expect(c: Char): Unit = {
      if (i >= h.length || h(i) != c) throw Malformed
      i += 1
    }
    def quoted(): String = {
      expect('\'')
      val sb = new StringBuilder
      while (i < h.length && h(i) != '\'') { sb += h(i); i += 1 }
      expect('\'')
      sb.toString
    }
    def number(): Long = {
      val start = i
      while (i < h.length && h(i).isDigit) i += 1
      if (i == start) throw Malformed
      java.lang.Long.parseLong(h.substring(start, i))
    }
    ws(); expect('{')
    var descr: String = null
    var fortran = false
    var sawFortran = false
    var shape: Seq[Long] = null
    var more = true
    while (more) {
      ws()
      val key = quoted()
      ws(); expect(':'); ws()
      key match {
        case "descr" =>
          if (descr != null) throw Malformed
          descr = quoted()
        case "fortran_order" =>
          if (sawFortran) throw Malformed
          sawFortran = true
          if (h.startsWith("True", i)) { fortran = true; i += 4 }
          else if (h.startsWith("False", i)) i += 5
          else throw Malformed
        case "shape" =>
          if (shape != null) throw Malformed
          expect('(')
          val dims = Seq.newBuilder[Long]
          ws()
          if (i < h.length && h(i) == ')') i += 1
          else {
            var inTuple = true
            var n = 0
            while (inTuple) {
              ws()
              dims += number()
              n += 1
              ws()
              if (i < h.length && h(i) == ',') {
                i += 1
                ws()
                if (i < h.length && h(i) == ')') { i += 1; inTuple = false }
              } else {
                expect(')')
                if (n == 1) throw Malformed // 1-tuples need the comma
                inTuple = false
              }
            }
          }
          shape = dims.result()
        case _ => throw Malformed
      }
      ws()
      if (i < h.length && h(i) == ',') {
        i += 1
        ws()
        if (i < h.length && h(i) == '}') { i += 1; more = false }
      } else { expect('}'); more = false }
    }
    // padding spaces then the mandatory newline terminator
    while (i < h.length - 1) { if (h(i) != ' ') throw Malformed; i += 1 }
    if (i >= h.length || h(i) != '\n') throw Malformed
    if (descr == null || !sawFortran || shape == null) throw Malformed
    (descr, fortran, shape)
  }

  /** Strict `.npy` decode. */
  def decode(b: Array[Byte]): Option[NpyArray] =
    try {
      if (b.length < 10 || (b(0) & 0xff) != 0x93 || b(1) != 'N' ||
        b(2) != 'U' || b(3) != 'M' || b(4) != 'P' || b(5) != 'Y')
        throw Malformed
      val major = b(6) & 0xff
      val minor = b(7) & 0xff
      if (major != 1 || minor != 0) throw Malformed // v1.0 scope
      val hlen = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
      if (10 + hlen > b.length) throw Malformed
      val (descr, fortran, shape) =
        parseHeader(new String(b, 10, hlen, "US-ASCII"))
      if (fortran) throw Malformed // outside the writer subset
      val item = ITEM.getOrElse(descr, throw Malformed)
      if (shape.exists(_ < 0)) throw Malformed
      val elems = shape.foldLeft(1L) { (a, d) =>
        val m = a * d
        if (d != 0 && m / d != a) throw Malformed
        m
      }
      val want = elems * item
      if (b.length - 10 - hlen != want) throw Malformed // exact data
      Some(NpyArray(descr, shape,
        java.util.Arrays.copyOfRange(b, 10 + hlen, b.length)))
    } catch {
      case Malformed => None
      case _: NumberFormatException => None
      case _: ArrayIndexOutOfBoundsException => None
    }

  /** Encode (numpy's own layout: header padded to 64-byte alignment). */
  private[graft] def encode(descr: String, shape: Seq[Long],
      data: Array[Byte]): Array[Byte] = {
    val shapeStr = shape.size match {
      case 0 => "()"
      case 1 => s"(${shape.head},)"
      case _ => shape.mkString("(", ", ", ")")
    }
    val base = s"{'descr': '$descr', 'fortran_order': False, " +
      s"'shape': $shapeStr, }"
    val total0 = 10 + base.length + 1
    val pad = (64 - total0 % 64) % 64
    val header = base + (" " * pad) + "\n"
    val out = new java.io.ByteArrayOutputStream
    out.write(0x93); out.write('N'); out.write('U'); out.write('M')
    out.write('P'); out.write('Y')
    out.write(1); out.write(0)
    out.write(header.length & 0xff); out.write((header.length >> 8) & 0xff)
    out.write(header.getBytes("US-ASCII"))
    out.write(data, 0, data.length)
    out.toByteArray
  }

  /** `.npz` decode: the d113 zip walk, then every member held to the
    * `.npy` grammar. */
  def decodeNpz(b: Array[Byte]): Option[Seq[(String, NpyArray)]] =
    try {
      val entries = ZipCodec.decode(b).getOrElse(throw Malformed)
      Some(entries.map { e =>
        if (!e.name.endsWith(".npy")) throw Malformed
        (e.name.stripSuffix(".npy"),
          decode(e.content).getOrElse(throw Malformed))
      })
    } catch { case _: Throwable => None }

  private[graft] def encodeNpz(arrays: Seq[(String, Array[Byte])]): Array[Byte] =
    ZipCodec.encode(arrays.map { case (n, bytes) =>
      ZipCodec.Entry(n + ".npy", 0, bytes)
    })
}

/** In-plan synthesizer + gate for d149: each doc an `.npz` of three
  * arrays — `ids` int64 [K], `feats` float32 [K, 6] of exact
  * quarters, `labels` uint8 [K] — K = 4 + doc_id%5, all values
  * closed-form. Damage %7: 0 → truncation; 3 → a LYING SHAPE in the
  * feats header (data and zip CRCs intact — numpy's format carries no
  * data checksum, so the shape-vs-bytes rule is the only thing
  * standing between a reader and silently misaligned features);
  * 5 → a header whose dict carries an UNKNOWN KEY (well-formed
  * python, spec-invalid). */
object NpySim {

  private[graft] def k(docId: Long): Int = (4 + docId % 5).toInt

  private[graft] def idVal(docId: Long, i: Int): Long = docId * 100 + i
  private[graft] def featVal(docId: Long, i: Int, j: Int): Float =
    (((docId + i * 6 + j) % 48) * 0.25).toFloat
  private[graft] def labelVal(docId: Long, i: Int): Int =
    ((docId + i) % 7).toInt

  private[graft] def npzFor(docId: Long): Array[Byte] = {
    val kk = k(docId)
    val mode = docId % 7
    val ids = new java.io.ByteArrayOutputStream
    (0 until kk).foreach { i =>
      val v = idVal(docId, i)
      var b = 0
      while (b < 8) { ids.write(((v >> (8 * b)) & 0xff).toInt); b += 1 }
    }
    val feats = new java.io.ByteArrayOutputStream
    (0 until kk).foreach { i =>
      (0 until 6).foreach { j =>
        val bits = java.lang.Float.floatToIntBits(featVal(docId, i, j))
        var b = 0
        while (b < 4) { feats.write((bits >> (8 * b)) & 0xff); b += 1 }
      }
    }
    val labels = new java.io.ByteArrayOutputStream
    (0 until kk).foreach(i => labels.write(labelVal(docId, i)))
    val featsNpy =
      if (mode == 3)
        NpyCodec.encode("<f4", Seq(kk.toLong + 1, 6L), feats.toByteArray)
      else if (mode == 5) {
        // a well-formed python dict with a key the spec doesn't allow
        val base = s"{'descr': '<f4', 'fortran_order': False, " +
          s"'mystery': 1, 'shape': ($kk, 6), }"
        val pad = (64 - (10 + base.length + 1) % 64) % 64
        val hdr = base + (" " * pad) + "\n"
        val out = new java.io.ByteArrayOutputStream
        out.write(0x93); out.write('N'); out.write('U'); out.write('M')
        out.write('P'); out.write('Y'); out.write(1); out.write(0)
        out.write(hdr.length & 0xff); out.write((hdr.length >> 8) & 0xff)
        out.write(hdr.getBytes("US-ASCII"))
        out.write(feats.toByteArray)
        out.toByteArray
      } else NpyCodec.encode("<f4", Seq(kk.toLong, 6L), feats.toByteArray)
    val clean = NpyCodec.encodeNpz(Seq(
      ("ids", NpyCodec.encode("<i8", Seq(kk.toLong), ids.toByteArray)),
      ("feats", featsNpy),
      ("labels", NpyCodec.encode("|u1", Seq(kk.toLong), labels.toByteArray))))
    if (mode == 0) java.util.Arrays.copyOf(clean, clean.length - 9)
    else clean
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_arrays", LongType),
    StructField("n_rows", LongType),
    StructField("sum_ids", LongType),
    StructField("sum_feats", DoubleType),
    StructField("sum_labels", LongType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val out =
              try {
                NpyCodec.decodeNpz(npzFor(id)).flatMap { arrays =>
                  val m = arrays.toMap
                  if (m.size != 3) None
                  else {
                    val idsA = m("ids"); val featsA = m("feats")
                    val labelsA = m("labels")
                    if (idsA.descr != "<i8" || featsA.descr != "<f4" ||
                      labelsA.descr != "|u1") None
                    else {
                      val n = idsA.shape.head
                      var sumIds = 0L
                      (0 until n.toInt).foreach { i =>
                        var v = 0L
                        var b = 0
                        while (b < 8) {
                          v |= (idsA.data(8 * i + b) & 0xffL) << (8 * b)
                          b += 1
                        }
                        sumIds += v
                      }
                      var sumFeats = 0.0
                      (0 until featsA.elems.toInt).foreach { i =>
                        var bits = 0
                        var b = 0
                        while (b < 4) {
                          bits |= (featsA.data(4 * i + b) & 0xff) << (8 * b)
                          b += 1
                        }
                        sumFeats += java.lang.Float.intBitsToFloat(bits)
                      }
                      val sumLabels =
                        labelsA.data.map(x => (x & 0xff).toLong).sum
                      Some(Row(id, 3L, n, sumIds, sumFeats, sumLabels))
                    }
                  }
                }
              } catch { case _: Throwable => None }
            out.iterator
          }
        }
      }(enc)
  }
}
