package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Roaring bitmaps — the compressed posting-list / doc-id-set format
  * every retrieval index and pruning layer at corpus scale runs on
  * (Lucene, Druid, ClickHouse; Spark's own shuffle tracking ships
  * org.roaringbitmap) — implemented from the PUBLISHED portable
  * serialization (github.com/RoaringBitmap/RoaringFormatSpec), BOTH
  * directions, no borrowed primitive:
  *
  *  - the two cookie grammars: 12346 (no run containers; the size
  *    word follows; offset header ALWAYS present) and 12347 (run
  *    containers; size-1 packed in the cookie's high 16 bits; the
  *    run-container bitset follows; offset header present only when
  *    size ≥ 4 — the NO_OFFSET_THRESHOLD rule);
  *  - descriptive headers: (uint16 key, uint16 cardinality-1) per
  *    container, keys STRICTLY increasing;
  *  - the three container types with their canonical-form rules
  *    ENFORCED: arrays (≤ 4096 strictly-increasing uint16s — a
  *    non-run container over 4096 MUST be a bitmap), bitmaps (1024
  *    little-endian words, and the POPCOUNT IS RECOUNTED against the
  *    declared cardinality — the lying-cardinality audit), runs
  *    (uint16 count, then (start, length-1) pairs, sorted,
  *    non-overlapping, non-adjacent, bounded by 65535, and the run
  *    total RECOUNTED against the declared cardinality);
  *  - the offset header CROSS-CHECKED against the byte positions
  *    actually walked (the d134 lying-index discipline: a reader that
  *    trusts offsets random-accesses garbage); trailing bytes after
  *    the last container QUARANTINE.
  *
  * Interop is pinned BOTH directions against org.roaringbitmap (the
  * library on Spark's own classpath): real `RoaringBitmap.serialize`
  * bytes — all three container types, runOptimized — walk through
  * this reader with the audits ON; this writer's bytes `deserialize`
  * back set-identical; and on the gate's container mix the two
  * writers agree BYTE-FOR-BYTE (RoaringSpec).
  */
object Roaring {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private val COOKIE_NO_RUN = 12346
  private val COOKIE_RUN = 12347
  private val NO_OFFSET_THRESHOLD = 4

  // ------------------------------------------------------------- reader

  /** Strict decode → (nContainers, sorted unsigned-int values);
    * None quarantines. */
  def decode(bytes: Array[Byte]): Option[(Int, Array[Int])] =
    try {
      var p = 0
      def u8(): Int = {
        if (p >= bytes.length) throw Malformed
        val v = bytes(p) & 0xff; p += 1; v
      }
      def u16(): Int = u8() | (u8() << 8)
      def i32(): Int = u16() | (u16() << 16)
      val cookie = i32()
      val hasRun = (cookie & 0xffff) == COOKIE_RUN
      val size =
        if (hasRun) (cookie >>> 16) + 1
        else if (cookie == COOKIE_NO_RUN) {
          val s = i32()
          if (s < 0 || s > 65536) throw Malformed
          s
        } else throw Malformed
      val runBits = new Array[Boolean](size)
      if (hasRun) {
        val nb = (size + 7) / 8
        var i = 0
        while (i < nb) {
          val b = u8()
          var k = 0
          while (k < 8) {
            val idx = i * 8 + k
            if (idx < size) runBits(idx) = ((b >> k) & 1) != 0
            k += 1
          }
          i += 1
        }
      }
      val keys = new Array[Int](size)
      val cards = new Array[Int](size)
      var i = 0
      while (i < size) {
        keys(i) = u16()
        cards(i) = u16() + 1
        if (i > 0 && keys(i) <= keys(i - 1)) throw Malformed
        i += 1
      }
      val hasOffsets = !hasRun || size >= NO_OFFSET_THRESHOLD
      val offsets = new Array[Int](size)
      if (hasOffsets) {
        i = 0
        while (i < size) { offsets(i) = i32(); i += 1 }
      }
      val out = Array.newBuilder[Int]
      var total = 0L
      i = 0
      while (i < size) {
        // the lying-offset audit: the header must agree with the walk
        if (hasOffsets && offsets(i) != p) throw Malformed
        val hi = keys(i) << 16
        val card = cards(i)
        if (runBits(i)) {
          val nRuns = u16()
          var run = 0
          var counted = 0L
          var prevEnd = -2
          while (run < nRuns) {
            val start = u16()
            val len = u16()
            if (start <= prevEnd + 1) throw Malformed // sorted, non-adjacent
            val end = start + len
            if (end > 65535) throw Malformed
            var v = start
            while (v <= end) { out += (hi | v); v += 1 }
            counted += len + 1
            prevEnd = end
            run += 1
          }
          if (counted != card) throw Malformed // the run-total audit
        } else if (card <= 4096) {
          var prev = -1
          var j = 0
          while (j < card) {
            val v = u16()
            if (v <= prev) throw Malformed // strictly increasing
            out += (hi | v)
            prev = v
            j += 1
          }
        } else {
          var pop = 0L
          var w = 0
          while (w < 1024) {
            var word = 0L
            var k = 0
            while (k < 8) { word |= u8().toLong << (8 * k); k += 1 }
            pop += java.lang.Long.bitCount(word)
            var bit = word
            while (bit != 0) {
              val v = w * 64 + java.lang.Long.numberOfTrailingZeros(bit)
              out += (hi | v)
              bit &= bit - 1
            }
            w += 1
          }
          if (pop != card) throw Malformed // the popcount audit
        }
        total += card
        i += 1
      }
      if (p != bytes.length) throw Malformed // trailing bytes
      val vals = out.result()
      if (vals.length != total) throw Malformed
      Some((size, vals))
    } catch { case _: Throwable => None }

  // ------------------------------------------------------------- writer

  private def runsOf(lows: Array[Int]): Array[(Int, Int)] = {
    val rs = Array.newBuilder[(Int, Int)]
    var i = 0
    while (i < lows.length) {
      val start = lows(i)
      var end = start
      while (i + 1 < lows.length && lows(i + 1) == end + 1) { i += 1; end += 1 }
      rs += ((start, end - start))
      i += 1
    }
    rs.result()
  }

  /** Portable-format encode of sorted distinct unsigned ints, choosing
    * each container's canonical representation by serialized size (the
    * reference library's runOptimize rule). The lie flags plant the
    * damage classes with every other byte intact. */
  def encode(values: Array[Int], lieRunCard: Boolean = false,
      lieOffset: Boolean = false): Array[Byte] = {
    val byKey = values.map(v => (v >>> 16, v & 0xffff))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (k, vs) => (k, vs.map(_._2).sorted) }
    sealed trait C
    case class Arr(lows: Array[Int]) extends C
    case class Bmp(lows: Array[Int]) extends C
    case class Run(rs: Array[(Int, Int)]) extends C
    val containers = byKey.map { case (k, lows) =>
      val rs = runsOf(lows)
      val runSize = 2 + 4 * rs.length
      val arrSize = 2 * lows.length
      val bmpSize = 8192
      val c: C =
        if (runSize < math.min(arrSize, bmpSize)) Run(rs)
        else if (lows.length <= 4096) Arr(lows)
        else Bmp(lows)
      (k, lows.length, c)
    }
    val hasRun = containers.exists(_._3.isInstanceOf[Run])
    val size = containers.size
    val out = new java.io.ByteArrayOutputStream
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >> 16) }
    if (hasRun) {
      w32(COOKIE_RUN | ((size - 1) << 16))
      val nb = (size + 7) / 8
      var i = 0
      while (i < nb) {
        var b = 0
        var k = 0
        while (k < 8) {
          val idx = i * 8 + k
          if (idx < size && containers(idx)._3.isInstanceOf[Run]) b |= 1 << k
          k += 1
        }
        w8(b)
        i += 1
      }
    } else { w32(COOKIE_NO_RUN); w32(size) }
    containers.zipWithIndex.foreach { case ((k, card, c), i) =>
      w16(k)
      val lied = if (lieRunCard && c.isInstanceOf[Run]) card + 1 else card
      w16(lied - 1)
    }
    val hasOffsets = !hasRun || size >= NO_OFFSET_THRESHOLD
    val headerEnd = out.size() + (if (hasOffsets) 4 * size else 0)
    if (hasOffsets) {
      var off = headerEnd
      containers.zipWithIndex.foreach { case ((_, card, c), i) =>
        val lie = if (lieOffset && i == math.min(2, size - 1)) 2 else 0
        w32(off + lie)
        off += (c match {
          case Run(rs) => 2 + 4 * rs.length
          case Arr(lows) => 2 * lows.length
          case Bmp(_) => 8192
        })
      }
    }
    containers.foreach { case (_, _, c) =>
      c match {
        case Run(rs) =>
          w16(rs.length)
          rs.foreach { case (s, l) => w16(s); w16(l) }
        case Arr(lows) => lows.foreach(w16)
        case Bmp(lows) =>
          val words = new Array[Long](1024)
          lows.foreach { v => words(v / 64) |= 1L << (v % 64) }
          words.foreach { word =>
            var k = 0
            while (k < 8) { w8(((word >> (8 * k)) & 0xff).toInt); k += 1 }
          }
      }
    }
    out.toByteArray
  }
}

/** In-plan synthesizer + gate for d140: each doc's posting set spans
  * all three container types across four 16-bit chunks — key 0 an
  * ARRAY (60 stride-37 values), key 1 a RUN pair ([1000, 1000+L] with
  * L = 150 + doc_id%50, plus [40000, 40099]), key 2 a 5-value array,
  * key 3 a BITMAP (4200 stride-13 values) on doc_id%3==1 docs and a
  * 7-value array otherwise — serialized through our writer, decoded
  * back through the strict reader, and aggregated. Damage %7: 0 →
  * truncation; 3 → a LYING run-container cardinality (runs intact —
  * only the recount audit catches it); 5 → a LYING OFFSET header
  * entry (every container byte intact — only the offsets-vs-walk
  * cross-check catches it). Damaged docs contribute nothing. */
object RoaringSim {

  private[graft] def valuesFor(docId: Long): Array[Int] = {
    val out = Array.newBuilder[Int]
    (0 until 60).foreach(i => out += (37 * i + (docId % 100)).toInt)
    val l1 = (150 + docId % 50).toInt
    (0 to l1).foreach(i => out += (65536 + 1000 + i))
    (0 until 100).foreach(i => out += (65536 + 40000 + i))
    (0 until 5).foreach(i => out += (131072 + 10 * i + (docId % 10).toInt))
    if (docId % 3 == 1)
      (0 until 4200).foreach(i => out += (196608 + 13 * i + (docId % 13).toInt))
    else
      (0 until 7).foreach(i => out += (196608 + 101 * i + (docId % 101).toInt))
    out.result()
  }

  private[graft] def bytesFor(docId: Long): Array[Byte] = {
    val mode = docId % 7
    val b = Roaring.encode(valuesFor(docId),
      lieRunCard = mode == 3, lieOffset = mode == 5)
    if (mode == 0) java.util.Arrays.copyOf(b, b.length - 5) else b
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_containers", LongType),
    StructField("cardinality", LongType),
    StructField("sum_vals", LongType),
    StructField("max_val", LongType),
    StructField("n_mult7", LongType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            Roaring.decode(bytesFor(id)) match {
              case Some((nc, vals)) =>
                var sum = 0L
                var mx = 0L
                var m7 = 0L
                vals.foreach { v =>
                  val u = v & 0xffffffffL
                  sum += u
                  if (u > mx) mx = u
                  if (u % 7 == 0) m7 += 1
                }
                Iterator.single(Row(id, nc.toLong, vals.length.toLong,
                  sum, mx, m7))
              case None => Iterator.empty
            }
          }
        }
      }(enc)
  }
}
