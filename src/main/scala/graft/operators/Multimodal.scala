package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.5 #51): image/audio/video as
  * opaque `binary` payloads + typed metadata, with a batched decode /
  * feature-extract stage.
  *
  * Two decoders share the one batch contract (Array[Array[Byte]] of
  * ≤ batchSize payloads in, one feature array per payload out):
  * [[realDecode]] actually parses uncompressed raster formats (PPM P6,
  * 24-bit BMP — flat header+pixels, decodable with zero codec libs)
  * into width/height/channel means; [[fakeDecode]] is the
  * deterministic stub the cross-engine gate hashes (compressed
  * formats would need the image/audio libs this container lacks). The
  * Spark-side plumbing is identical either way — binary column,
  * metadata struct, and a mapPartitions stage that drains the
  * iterator in fixed-size batches exactly the way an Arrow/pandas-UDF
  * batch decode would on a cluster.
  */
object Multimodal {

  val BATCH_SIZE = 32

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_bytes", LongType),
    StructField("feature", ArrayType(FloatType))))

  /** Attach a fake binary payload + typed metadata to documents (the
    * driver corpus has no real media; payload = utf8 bytes of text). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        (lit(100) + col("n_chars") % 540).cast("int").as("width"),
        (lit(100) + (col("n_chars") * 7) % 380).cast("int").as("height"),
        element_at(array(lit("png"), lit("jpeg"), lit("webp")),
          (col("doc_id") % 3 + 1).cast("int")).as("format")).as("meta"))

  /** STUB decoder: deterministic 4-float feature from payload bytes.
    * A real deployment swaps this body for the image/audio decode; the
    * signature (one batch of payloads in, one feature array per payload
    * out) is the contract a GPU/native decoder needs. */
  def fakeDecode(batch: Array[Array[Byte]]): Array[Array[Float]] =
    batch.map { bytes =>
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      Array((h & 0xFFFF).toFloat, ((h >> 16) & 0xFFFF).toFloat,
        ((h >> 32) & 0xFFFF).toFloat, bytes.length.toFloat)
    }

  /** REAL decode for uncompressed raster formats — PPM (P6) and 24-bit
    * uncompressed BMP — pure JVM header+raster parses, no codec libs
    * (these formats are flat header + pixels, which is exactly what a
    * sandbox without media libraries can decode for real). Feature
    * layout: [width, height, meanR, meanG, meanB]. A payload that is
    * neither format falls back to [[fakeDecode]]'s deterministic
    * feature, so a mixed corpus decodes batch-wise with no partial
    * failure path. Same batch contract as [[fakeDecode]]: plug into
    * [[decodeFeatures]] via its `decoder` parameter. */
  def realDecode(batch: Array[Array[Byte]]): Array[Array[Float]] =
    batch.map { bytes =>
      decodePpm(bytes).orElse(decodeBmp(bytes))
        .getOrElse(fakeDecode(Array(bytes))(0))
    }

  /** PPM "P6": ASCII header `P6 <w> <h> <maxval>` (whitespace-
    * separated, `#` comments to end-of-line), one whitespace byte,
    * then w·h RGB triplets (maxval < 256 ⇒ 1 byte per channel). */
  private[graft] def decodePpmSums(b: Array[Byte]): Option[Array[Long]] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    var i = 2
    def nextInt(): Int = { // -1 = malformed
      while (i < b.length && (b(i) == '#' || Character.isWhitespace(b(i)))) {
        if (b(i) == '#') while (i < b.length && b(i) != '\n') i += 1
        else i += 1
      }
      val s = i
      while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
      if (i > s && i - s <= 9) new String(b, s, i - s).toInt else -1
    }
    val w = nextInt(); val h = nextInt(); val maxv = nextInt()
    i += 1 // the single whitespace byte that terminates the header
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv >= 256 ||
      w.toLong * h > Int.MaxValue / 3 ||
      b.length - i < w.toLong * h * 3) return None
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = i
    val end = i + w * h * 3
    while (p < end) {
      sr += b(p) & 0xFF; sg += b(p + 1) & 0xFF; sb += b(p + 2) & 0xFF
      p += 3
    }
    Some(Array(w.toLong, h.toLong, sr, sg, sb))
  }

  private[operators] def decodePpm(b: Array[Byte]): Option[Array[Float]] =
    decodePpmSums(b).map(meanFeature)

  /** BMP: "BM" file header (pixel offset at byte 10), BITMAPINFOHEADER
    * (w/h at 18/22, little-endian; negative height = top-down),
    * 24 bpp, BI_RGB (uncompressed) only; rows pad to 4 bytes, pixels
    * are BGR. Row order is irrelevant for channel means. */
  private[graft] def decodeBmpSums(b: Array[Byte]): Option[Array[Long]] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    def le32(o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
    def le16(o: Int): Int = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    val off = le32(10); val w = le32(18); val hRaw = le32(22)
    if (le16(26) != 1 || le16(28) != 24 || le32(30) != 0) return None
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0 || off < 54 || w.toLong * h > Int.MaxValue / 3) return None
    val rowBytes = ((w * 3 + 3) / 4) * 4
    if (b.length.toLong < off.toLong + rowBytes.toLong * h) return None
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var p = off + y * rowBytes
      val end = p + w * 3
      while (p < end) {
        sb += b(p) & 0xFF; sg += b(p + 1) & 0xFF; sr += b(p + 2) & 0xFF
        p += 3
      }
      y += 1
    }
    Some(Array(w.toLong, h.toLong, sr, sg, sb))
  }

  private[operators] def decodeBmp(b: Array[Byte]): Option[Array[Float]] =
    decodeBmpSums(b).map(meanFeature)

  /** [w, h, meanR, meanG, meanB] from exact sums — the
    * [[decodeFeatures]] float-feature contract; the exact long sums
    * stay available to [[decodeStats]], which must not round-trip a
    * 24-bit-mantissa mean back into a sum (exact only under ~30 k
    * pixels). */
  private def meanFeature(sums: Array[Long]): Array[Float] = {
    val n = sums(0) * sums(1)
    Array(sums(0).toFloat, sums(1).toFloat, (sums(2).toDouble / n).toFloat,
      (sums(3).toDouble / n).toFloat, (sums(4).toDouble / n).toFloat)
  }

  /** Frame sampling over an opaque payload: fixed-size frames at a
    * keep-every-Nth stride — the video-frame-sample shape (a real
    * deployment points frameBytes at the container's frame table or a
    * fixed-rate codec; the windowing/stride/explode plumbing is what
    * Spark owns either way). Pure Catalyst expressions — map-only,
    * codegen'd, scan-speed at any corpus size; one output row per kept
    * frame, frame identity = md5 (verifiable in any engine).
    *
    * Slices the BINARY column directly (`substring`/`length`/`md5` all
    * operate byte-wise on BinaryType), so frames are byte-accurate for
    * arbitrary non-UTF-8 payloads. The DuckDB oracle replays it over
    * the text column (its 1.0 BLOB type has no substring/md5), which is
    * equivalent only because the gate corpus is pure ASCII — verified:
    * octet_length(encode(text)) == length(text) for every row. */
  def sampleFrames(withPayloads: DataFrame, frameBytes: Int = 256,
                   everyN: Int = 2): DataFrame = {
    val nFrames = ceil(length(col("_b")).cast("double") / frameBytes).cast("long")
    val frame = col("_b").substr((col("frame_idx") * frameBytes + 1).cast("int"),
      lit(frameBytes))
    withPayloads
      .select(col("doc_id"), col("payload").as("_b"))
      // empty payload → no frames (DuckDB's generate_series(0,-1,2) is
      // empty; Spark's sequence would throw on the reversed bounds)
      .where(length(col("_b")) > 0)
      .select(col("doc_id"), col("_b"),
        explode(sequence(lit(0L), nFrames - 1, lit(everyN.toLong))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        length(frame).cast("long").as("frame_len"),
        md5(frame).as("frame_hash"))
  }

  /** Blockhash-style PERCEPTUAL fingerprint (Yang et al.'s blockhash;
    * the aHash family): split the payload byte stream into `blocks`
    * equal spans, one fingerprint bit per span = "span mean above the
    * global mean", compared as the cross-multiplication
    * `sum_b · n > S · n_b` — pure integer arithmetic, no division, so
    * the fingerprint is bit-identical in any engine. On a real image
    * corpus the spans are pixel tiles of the decoded raster (the
    * [[realDecode]] path feeds the same rule); byte spans are the
    * payload-level analog that needs no codec and still clusters
    * shifted/truncated variants at small hamming distance.
    *
    * Map-only Catalyst expressions (transform/slice/aggregate) — the
    * fingerprint costs one codegen'd pass, O(blocks·len) per row, no
    * shuffle. MSB-first bit fold keeps fp in [0, 2³²) for the default
    * 32 blocks (never a negative long, so band shifts are safe).
    * Assumes a non-empty single-byte-encoded payload (the corpus
    * ASCII guarantee d29 documents). */
  /** The payload byte-code array (ASCII contract — see [[blockHash]]). */
  def payloadCodes(payloadText: Column): Column =
    transform(split(payloadText, ""), c => ascii(c).cast("long"))

  /** Fingerprint from PRE-MATERIALIZED codes/length/sum attributes.
    * Keeping these as attributes matters: referencing the codes
    * EXPRESSION here would inline the split+ascii tree into every one
    * of the `blocks` lambdas (CollapseProject declines to merge a
    * multi-referenced non-cheap alias for exactly this reason), turning
    * one pass per row into `blocks` passes. [[phashPairs]] stages the
    * projection; [[blockHash]] is the composed single-Column reference
    * form. */
  private def blockHashFromStats(codes: Column, n: Column, s: Column,
                                 blocks: Int): Column = {
    require(blocks > 0 && (blocks & (blocks - 1)) == 0,
      "blocks must be a power of two (block bounds via shiftright)")
    val shift = java.lang.Integer.numberOfTrailingZeros(blocks)
    val bits = transform(sequence(lit(0L), lit(blocks - 1L)), b => {
      val lo = shiftright(b * n, shift)
      val nb = shiftright((b + 1L) * n, shift) - lo
      val sb = aggregate(slice(codes, (lo + 1L).cast("int"), nb.cast("int")),
        lit(0L), (a, x) => a + x)
      when(sb * n > s * nb, lit(1L)).otherwise(lit(0L))
    })
    aggregate(bits, lit(0L), (a, x) => a * 2L + x)
  }

  def blockHash(payloadText: Column, blocks: Int = 32): Column = {
    val codes = payloadCodes(payloadText)
    blockHashFromStats(codes, size(codes).cast("long"),
      aggregate(codes, lit(0L), (a, x) => a + x), blocks)
  }

  /** Add the 32-block fingerprint of `frameStr` as column `fp`,
    * STAGED through named projections so the codes array is computed
    * once, not once per block-bound reference (CollapseProject keeps
    * the staging because the alias is non-cheap and multi-referenced
    * — the SURVEY §8.3 inlining wall). Shared by the batch
    * [[keyFrames]] and the streaming twin — a map-only column
    * transform, so it runs on a stream unchanged. */
  def withFrameFingerprint(df: DataFrame, frameStr: Column): DataFrame =
    df.withColumn("_codes", payloadCodes(frameStr))
      .withColumn("_n", size(col("_codes")).cast("long"))
      .withColumn("_s", aggregate(col("_codes"), lit(0L), (a, x) => a + x))
      .withColumn("fp",
        blockHashFromStats(col("_codes"), col("_n"), col("_s"), blocks = 32))
      .drop("_codes", "_n", "_s")

  /** Perceptual near-dup pairs over payloads: [[blockHash]]
    * fingerprints → the SAME 4×8-bit banded blocking + hamming verify
    * the simhash path uses ([[Dedup.fingerprintPairs]]) — shifted or
    * truncated payload variants collide in ≥ 1 band and verify at
    * hamming ≤ `maxHamming`. Default uncapped (oracle-exact);
    * production passes `maxBucket = Dedup.MAX_FULL_BUCKET` so a
    * boilerplate-payload bucket star-expands instead of pairing O(b²)
    * (d53's trade, spec-pinned there). */
  def phashPairs(docs: DataFrame, payloadText: Column,
                 id: org.apache.spark.sql.Column, maxHamming: Int = 3,
                 maxBucket: Int = Int.MaxValue): DataFrame = {
    val staged = docs
      .select(id.as("doc_id"), payloadCodes(payloadText).as("_codes"))
      .select(col("doc_id"), col("_codes"),
        size(col("_codes")).cast("long").as("_n"),
        aggregate(col("_codes"), lit(0L), (a, x) => a + x).as("_s"))
      .select(col("doc_id"), blockHashFromStats(col("_codes"),
        col("_n"), col("_s"), blocks = 32).as("fp"))
    Dedup.fingerprintPairs(staged, bands = 4, bandBits = 8,
      maxHamming = maxHamming, maxBucket = maxBucket)
  }

  /** Keyframe selection — the shot-boundary rule of video curation:
    * split the payload into consecutive frames, fingerprint each with
    * the [[blockHash]] perceptual rule, and keep a frame when its
    * hamming distance to the PREVIOUS frame jumps above the threshold
    * (plus the first frame, unconditionally). Redundant near-static
    * runs collapse to their first frame; every visual cut survives —
    * the frame-budget lever a video corpus needs before feature
    * extraction.
    *
    * The lag window is keyed by doc and bounded by frames-per-doc
    * (payload/frameBytes — never corpus-sized). Fingerprints stage
    * codes/len/sum as attributes first (the [[phashPairs]] rule: a
    * multi-referenced non-cheap alias inlines into all 32 block
    * lambdas otherwise). Pure integer arithmetic end-to-end — the
    * oracle replays frames, fingerprints, and the lag rule exactly. */
  def keyFrames(withPayloads: DataFrame, frameBytes: Int = 256,
                maxStaticHamming: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nFrames = ceil(length(col("_b")).cast("double") / frameBytes).cast("long")
    val frameStr = col("_b").substr((col("frame_idx") * frameBytes + 1).cast("int"),
      lit(frameBytes)).cast("string")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    withPayloads
      .select(col("doc_id"), col("payload").as("_b"))
      .where(length(col("_b")) > 0)
      .select(col("doc_id"), col("_b"),
        explode(sequence(lit(0L), nFrames - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"), frameStr.as("_frame"))
      .transform(withFrameFingerprint(_, col("_frame")))
      .select(col("doc_id"), col("frame_idx"), col("fp"))
      .withColumn("hamming",
        when(lag(col("fp"), 1).over(w).isNull, lit(-1L))
          .otherwise(bit_count(col("fp").bitwiseXOR(lag(col("fp"), 1).over(w)))
            .cast("long")))
      .withColumn("keyframe",
        col("hamming") === -1L || col("hamming") > maxStaticHamming)
      .select(col("doc_id"), col("frame_idx"), col("fp"), col("hamming"),
        col("keyframe"))
  }

  /** Batched decode stage: mapPartitions drains rows in BATCH_SIZE
    * groups — the Scala analog of `mapInPandas` batch decode. The
    * decoder is pluggable: [[fakeDecode]] (default — the
    * deterministic cross-engine gate path) or [[realDecode]] (actual
    * PPM/BMP pixel decode). */
  def decodeFeatures(spark: SparkSession, withPayloads: DataFrame,
                     decoder: Array[Array[Byte]] => Array[Array[Float]] = fakeDecode): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    withPayloads.select(col("doc_id"), col("payload"),
      col("meta.width"), col("meta.height"), col("meta.format"))
      .mapPartitions { rows =>
        rows.grouped(BATCH_SIZE).flatMap { chunk =>
          // NULL payloads decode as empty byte arrays (the pluggable
          // decoder contract takes raw batches; an NPE here would
          // abort the whole stage)
          val payloads = chunk.map(r =>
            Option(r.getAs[Array[Byte]]("payload"))
              .getOrElse(Array.emptyByteArray)).toArray
          val feats = decoder(payloads)
          chunk.iterator.zipWithIndex.map { case (r, i) =>
            Row(r.getAs[Long]("doc_id"), r.getAs[Int]("width"),
              r.getAs[Int]("height"), r.getAs[String]("format"),
              payloads(i).length.toLong, feats(i))
          }
        }
      }(enc)
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("n_bytes", LongType)))

  /** STRICT batched decode → per-image stats, with quarantine: a
    * payload the real decoder cannot parse (wrong magic, malformed
    * header, truncated raster) produces a `status='quarantined'` row
    * with NULL stats instead of silently falling back to the stub —
    * the error-path contract a 100 TB multimodal ingest needs (drop
    * nothing, decode nothing wrong, keep the rejects auditable).
    *
    * Emits exact per-channel pixel SUMS, not means: sums are integers
    * (≤ 255·npixels), recovered exactly from the decoder's float mean
    * (mean·n has abs error ≪ 0.5 for gate-sized rasters), so the
    * DuckDB oracle replays them with integer arithmetic — no
    * float-rounding boundary cases in the hash.
    *
    * Same mapPartitions batch shape as [[decodeFeatures]]: the stage
    * is map-only, one decoder call per [[BATCH_SIZE]] payloads, scan
    * partitioning preserved — at any corpus size this parallelizes as
    * widely as the scan itself. */
  def decodeStats(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(statsSchema)
    withPayloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(BATCH_SIZE).flatMap { chunk =>
          val payloads = chunk.map(_.getAs[Array[Byte]]("payload")).toArray
          // exact long sums straight from the decoders — reconstructing
          // a sum from the float mean is only exact under ~30 k pixels;
          // a NULL payload (outer join, missing blob) quarantines
          // instead of NPE-ing the task
          val feats = payloads.map(b =>
            if (b == null) None else decodePpmSums(b).orElse(decodeBmpSums(b)))
          chunk.iterator.zipWithIndex.map { case (r, i) =>
            val id = r.getAs[Long]("doc_id")
            val nb = if (payloads(i) == null) 0L else payloads(i).length.toLong
            feats(i) match {
              case Some(f) =>
                Row(id, "ok", f(0).toInt, f(1).toInt, f(2), f(3), f(4), nb)
              case None =>
                Row(id, "quarantined", null, null, null, null, null, nb)
            }
          }
        }
      }(enc)
  }

  /** Samples with |s| below this are "silence" for trim purposes —
    * far under [[AudioSim]]'s minimum tone amplitude (500) and far
    * over its exact-zero silence, so the boundary is unambiguous in
    * both engines. */
  val SILENCE_THRESH = 100

  val audioStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_samples", LongType),
    StructField("lead_silence", LongType),
    StructField("trail_silence", LongType),
    StructField("sum_abs", LongType),
    StructField("peak", IntegerType),
    StructField("n_bytes", LongType)))

  /** RIFF/WAVE s16le mono PCM parser — the audio twin of
    * [[decodePpm]]/[[decodeBmp]]: walks the chunk list (not fixed
    * offsets — a real WAV may carry LIST/fact chunks before data),
    * requires PCM format 1, 16-bit, and a data chunk fully present in
    * the buffer (a declared-size past the available bytes is the
    * truncation signal → None → quarantine). Returns
    * (nSamples, leadSilence, trailSilence, sumAbs, peak). */
  private[graft] def decodeWav(b: Array[Byte]): Option[Array[Long]] = {
    def u16(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    def u32(i: Int): Long = (u16(i).toLong) | (u16(i + 2).toLong << 16)
    def tag(i: Int, s: String): Boolean =
      i + 4 <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j))
    if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var fmtOk = false
    var dataAt = -1; var dataLen = -1L
    while (i + 8 <= b.length && dataAt < 0) {
      val sz = u32(i + 4)
      // a declared chunk size past the buffer is either corruption or
      // truncation; for non-data chunks it would also overflow the
      // Int stride below
      if (sz > b.length) return None
      if (tag(i, "fmt ")) {
        if (sz < 16 || i + 8 + 16 > b.length) return None
        // PCM (1), mono, 16-bit — anything else needs a codec lib
        fmtOk = u16(i + 8) == 1 && u16(i + 10) == 1 && u16(i + 22) == 16
      } else if (tag(i, "data")) { dataAt = i + 8; dataLen = sz }
      i += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataAt < 0 || dataLen < 0 || dataLen % 2 != 0 ||
      dataAt + dataLen > b.length) return None
    val n = (dataLen / 2).toInt
    var sumAbs = 0L; var peak = 0
    var lead = 0; var leadDone = false
    var trail = 0
    var j = 0
    while (j < n) {
      val s = u16(dataAt + 2 * j).toShort.toInt
      val a = math.abs(s)
      sumAbs += a
      if (a > peak) peak = a
      if (a < SILENCE_THRESH && !leadDone) lead += 1
      else leadDone = true
      if (a < SILENCE_THRESH) trail += 1 else trail = 0
      j += 1
    }
    // all-silent buffer: everything is lead, nothing is trail
    if (!leadDone) trail = 0
    Some(Array(n.toLong, lead.toLong, trail.toLong, sumAbs, peak.toLong))
  }

  /** Batched WAV decode → per-clip stats with quarantine — the d93
    * gate: same mapPartitions batch contract as [[decodeStats]]
    * (map-only, one decoder call per [[BATCH_SIZE]] payloads, scan
    * partitioning preserved), emitting sample count, leading/trailing
    * silence runs (the trim decision), exact integer Σ|sample| and
    * peak. Unparseable payloads (bad magic, truncated data chunk,
    * non-PCM fmt) become `status='quarantined'` rows with NULL stats
    * and their byte count — nothing dropped, everything auditable. */
  def audioStats(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(audioStatsSchema)
    withPayloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(BATCH_SIZE).flatMap { chunk =>
          val payloads = chunk.map(_.getAs[Array[Byte]]("payload")).toArray
          val feats = payloads.map(b => if (b == null) None else decodeWav(b))
          chunk.iterator.zipWithIndex.map { case (r, i) =>
            val id = r.getAs[Long]("doc_id")
            val nb = if (payloads(i) == null) 0L else payloads(i).length.toLong
            feats(i) match {
              case Some(f) =>
                Row(id, "ok", f(0), f(1), f(2), f(3), f(4).toInt, nb)
              case None =>
                Row(id, "quarantined", null, null, null, null, null, nb)
            }
          }
        }
      }(enc)
  }

  val videoStatsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("status", StringType),
    StructField("n_frames", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sum_b", LongType),
    StructField("sum_g", LongType),
    StructField("sum_r", LongType),
    StructField("n_bytes", LongType)))

  /** RIFF/AVI uncompressed-DIB parser — the video twin of
    * [[decodeWav]]: walks the top-level chunk list for the hdrl LIST
    * (avih main header → width/height/frame count; strf
    * BITMAPINFOHEADER → must be 24-bit BI_RGB) and the movi LIST,
    * then iterates the 00db frame chunks, summing per-channel pixel
    * values row by row and SKIPPING the 4-byte row padding — the real
    * DIB walk, not a byte sum. Truncated frames, a frame-count
    * mismatch, non-DIB formats, or a stomped form tag → None →
    * quarantine. Returns (nFrames, width, height, sumB, sumG, sumR). */
  private[graft] def decodeAvi(b: Array[Byte]): Option[Array[Long]] = {
    def u16(i: Int): Int = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
    def u32(i: Int): Long = (u16(i).toLong) | (u16(i + 2).toLong << 16)
    def tag(i: Int, s: String): Boolean =
      i + 4 <= b.length && s.indices.forall(j => b(i + j) == s.charAt(j))
    if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "AVI ")) return None
    var w = 0; var h = 0; var frames = -1L
    var fmtOk = false
    var moviAt = -1; var moviEnd = -1
    var i = 12
    while (i + 8 <= b.length && (moviAt < 0 || frames < 0)) {
      val sz = u32(i + 4)
      // every declared size is bounds-checked BEFORE use: a lying
      // header must quarantine (None), never index past the buffer or
      // produce a non-advancing (or negative) stride that hangs the
      // executor task — the i+8+sz form also rejects u32 values whose
      // .toInt would go negative
      if (i + 8 + sz > b.length) return None
      if (tag(i, "LIST")) {
        if (i + 12 > b.length) return None
        if (tag(i + 8, "movi")) { moviAt = i + 12; moviEnd = i + 8 + sz.toInt }
        else if (tag(i + 8, "hdrl")) {
          // walk the hdrl sub-chunks: avih, then nested strl LIST
          var j = i + 12
          val hEnd = i + 8 + sz.toInt // <= b.length by the guard above
          while (j + 8 <= hEnd) {
            val ssz = u32(j + 4)
            if (j + 8 + ssz > hEnd) return None
            if (tag(j, "avih") && ssz >= 40) {
              frames = u32(j + 8 + 16)
              w = u32(j + 8 + 32).toInt; h = u32(j + 8 + 36).toInt
            } else if (tag(j, "LIST") && tag(j + 8, "strl")) {
              var k = j + 12
              val sEnd = j + 8 + ssz.toInt
              while (k + 8 <= sEnd) {
                val csz = u32(k + 4)
                if (k + 8 + csz > sEnd) return None
                if (tag(k, "strf") && csz >= 40)
                  // BITMAPINFOHEADER: planes=1, 24-bit, BI_RGB
                  fmtOk = u16(k + 8 + 12) == 1 && u16(k + 8 + 14) == 24 &&
                    u32(k + 8 + 16) == 0L
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
    // frame geometry in Long: width/height come from unvalidated u32
    // header fields, and the Int product can WRAP to a small
    // non-negative value (w=2, h=0x20000000 → frameBytes=0) that
    // passes the csz and bounds checks and sends the pixel loop past
    // the buffer. A frame bigger than the movi payload cannot be real,
    // so reject before narrowing to Int.
    val rowBytesL = ((3L * w + 3) / 4) * 4
    val frameBytesL = rowBytesL * h.toLong
    // The movi-payload fit check only applies when a frame must
    // actually fit: a zero-frame AVI legitimately carries an empty
    // movi LIST (payload −8 after the list header) and must still
    // decode to n=0. The <=0 overflow guard stays unconditional.
    if (frameBytesL <= 0 ||
      (frames > 0 && frameBytesL > moviEnd.toLong - moviAt - 8))
      return None
    val rowBytes = rowBytesL.toInt
    val frameBytes = frameBytesL.toInt
    var sb = 0L; var sg = 0L; var sr = 0L
    var n = 0L
    var p = moviAt
    while (p + 8 <= moviEnd) {
      val csz = u32(p + 4)
      if (!tag(p, "00db") && !tag(p, "00dc")) return None
      // the bound must stay in LONG: for a movi payload approaching
      // 2 GiB the Int sum p + 8 + frameBytes can exceed 2³¹, wrap
      // negative, pass the check, and the row walk indexes past `b` —
      // the same wrap class the frameBytesL guard above closes, one
      // notch narrower (needs a >1 GiB single frame). A 2 GiB fixture
      // is untestable at sane heap, so the invariant is held by
      // construction here instead of by a spec.
      if (csz != frameBytesL || p.toLong + 8 + frameBytesL > moviEnd) return None
      var row = 0
      while (row < h) {
        val base = p + 8 + row * rowBytes
        var x = 0
        while (x < w) {
          sb += b(base + 3 * x) & 0xFF
          sg += b(base + 3 * x + 1) & 0xFF
          sr += b(base + 3 * x + 2) & 0xFF
          x += 1
        }
        row += 1
      }
      n += 1
      p += 8 + frameBytes + (frameBytes & 1)
    }
    if (n != frames) return None
    Some(Array(n, w.toLong, h.toLong, sb, sg, sr))
  }

  /** Batched AVI decode → per-clip stats with quarantine — the d97
    * gate (same mapPartitions batch contract as [[decodeStats]] and
    * [[audioStats]]): frame count, dimensions, per-channel pixel sums
    * over all frames; unparseable payloads quarantine with NULL stats
    * and their byte count. */
  def videoStats(spark: SparkSession, withPayloads: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(videoStatsSchema)
    withPayloads.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.grouped(BATCH_SIZE).flatMap { chunk =>
          val payloads = chunk.map(_.getAs[Array[Byte]]("payload")).toArray
          val feats = payloads.map(b => if (b == null) None else decodeAvi(b))
          chunk.iterator.zipWithIndex.map { case (r, i) =>
            val id = r.getAs[Long]("doc_id")
            val nb = if (payloads(i) == null) 0L else payloads(i).length.toLong
            feats(i) match {
              case Some(f) =>
                Row(id, "ok", f(0), f(1).toInt, f(2).toInt, f(3), f(4), f(5), nb)
              case None =>
                Row(id, "quarantined", null, null, null, null, null, null, nb)
            }
          }
        }
      }(enc)
  }
}

/** Deterministic in-plan image synthesizer for the d89 gate: every
  * doc becomes a REAL raster file (PPM P6 for even doc_ids, 24-bit
  * BMP for odd — built byte-exact with hex/unhex Column expressions),
  * two-tone so the raster loop genuinely sums differing pixels, with
  * closed-form dimensions/colors a SQL oracle can replay
  * arithmetically. doc_id % 7 ∈ {0, 3} payloads are then damaged
  * (raster truncated to half / magic overwritten) to exercise the
  * quarantine path. The same construct-from-columns-then-parse
  * pattern as the slurm s-queries (SURVEY §2 preamble). */
object ImageSim {

  /** 2-digit uppercase hex of a byte-valued column. */
  private def hb(c: Column): Column = lpad(hex(c % 256), 2, "0")

  private def le32(x: Column): Column = concat(
    hb(x), hb(x / 256), hb(x / 65536), hb(x / 16777216))

  /** doc_id → (payload, plus the closed-form ground truth columns the
    * spec asserts against; the gate only ships doc_id+payload). */
  def payloads(docs: DataFrame): DataFrame = {
    val k = col("doc_id")
    val base = docs.select(
      k.as("doc_id"),
      (lit(2) + k % 6).cast("int").as("w"),        // 2..7
      (lit(2) + (k * 3) % 5).cast("int").as("h"),  // 2..6
      (k % 256).as("rA"), ((k * 7 + 11) % 256).as("gA"),
      ((k * 13 + 5) % 256).as("bA"))
      .withColumn("rB", (col("rA") + 91) % 256)
      .withColumn("gB", (col("gA") + 57) % 256)
      .withColumn("bB", (col("bA") + 171) % 256)
      .withColumn("hA", col("h") / 2 cast "int")   // first hA rows tone A
      .withColumn("hB", col("h") - col("hA"))
    // SQL repeat() takes a column count (unlike functions.repeat's Int
    // parameter) — build the rasters through expr() over named columns
    val mid = base
      .withColumn("_pixA", concat(hb(col("rA")), hb(col("gA")), hb(col("bA"))))
      .withColumn("_pixB", concat(hb(col("rB")), hb(col("gB")), hb(col("bB"))))
      .withColumn("_pixABgr", concat(hb(col("bA")), hb(col("gA")), hb(col("rA"))))
      .withColumn("_pixBBgr", concat(hb(col("bB")), hb(col("gB")), hb(col("rB"))))
      .withColumn("_rowBytes", ((col("w") * 3 + 3) / 4).cast("int") * 4)
      .withColumn("_pad", expr("repeat('00', _rowBytes - 3*w)"))
      .withColumn("_ppmRaster", expr(
        "concat(repeat(repeat(_pixA, w), hA), repeat(repeat(_pixB, w), hB))"))
      .withColumn("_bmpRaster", expr(
        "concat(repeat(concat(repeat(_pixABgr, w), _pad), hA)," +
        " repeat(concat(repeat(_pixBBgr, w), _pad), hB))"))
    val ppmHeader = concat(lit("P6\n"), col("w").cast("string"), lit(" "),
      col("h").cast("string"), lit("\n255\n"))
    // 14-byte file header + 40-byte BITMAPINFOHEADER, trailing 20 bytes
    // (image size / resolutions / palette counts) zero — ignored by any
    // BI_RGB reader
    val bmpHeaderHex = concat(lit("424D"),
      le32(lit(54) + col("_rowBytes") * col("h")), lit("00000000"),
      le32(lit(54)), le32(lit(40)), le32(col("w")), le32(col("h")),
      lit("0100"), lit("1800"), le32(lit(0)), expr("repeat('00', 20)"))
    val built = mid
      .withColumn("_payload0",
        when(col("doc_id") % 2 === 0,
          concat(ppmHeader.cast("binary"), unhex(col("_ppmRaster"))))
        .otherwise(unhex(concat(bmpHeaderHex, col("_bmpRaster")))))
    // damage pass: %7==0 → truncate to half; %7==3 → stomp the magic
    val damaged = built.withColumn("payload",
      when(col("doc_id") % 7 === 0,
        col("_payload0").substr(lit(1), floor(length(col("_payload0")) / 2).cast("int")))
      .when(col("doc_id") % 7 === 3,
        concat(unhex(lit("5858")),
          col("_payload0").substr(lit(3), length(col("_payload0")).cast("int"))))
      .otherwise(col("_payload0")))
    damaged.select(col("doc_id"), col("payload"),
      col("w"), col("h"), col("hA"), col("hB"),
      col("rA"), col("gA"), col("bA"), col("rB"), col("gB"), col("bB"))
  }
}

/** Deterministic in-plan WAV synthesizer for the d93 gate — the audio
  * twin of [[ImageSim]]: every doc becomes a REAL RIFF/WAVE file
  * (44-byte canonical header + s16le mono PCM, built byte-exact with
  * hex/unhex Column expressions) holding leading silence, an
  * alternating ±A square tone, and trailing silence with closed-form
  * lengths/amplitude a SQL oracle replays arithmetically. doc_id % 9
  * ∈ {0, 4} payloads are damaged (data chunk cut short by 6 bytes /
  * RIFF magic overwritten) to exercise the quarantine path. */
object AudioSim {

  private def hb(c: Column): Column = lpad(hex(c % 256), 2, "0")
  private def le16(x: Column): Column = concat(hb(x), hb(x / 256))
  private def le32(x: Column): Column = concat(
    hb(x), hb(x / 256), hb(x / 65536), hb(x / 16777216))
  private def tagHex(s: String): Column =
    lit(s.getBytes("US-ASCII").map(b => f"$b%02X").mkString)

  /** doc_id → (payload, plus the closed-form ground-truth columns the
    * spec asserts against; the gate only ships doc_id+payload). */
  def payloads(docs: DataFrame): DataFrame = {
    val k = col("doc_id")
    val base = docs.select(
      k.as("doc_id"),
      (lit(2) + k % 5).cast("int").as("z1"),            // 2..6 lead zeros
      (lit(4) + k % 7).cast("int").as("n"),             // 4..10 tone samples
      (lit(1) + (k * 3) % 4).cast("int").as("z2"),      // 1..4 trail zeros
      (lit(500) + (k * 37) % 2000).cast("int").as("amp")) // 500..2499
      .withColumn("_nsamp", col("z1") + col("n") + col("z2"))
      .withColumn("_dbytes", col("_nsamp") * 2)
    // tone = ⌊n/2⌋ (+A, −A) pairs, plus one +A if n is odd; −A s16le
    // is the two's-complement 65536 − A
    val mid = base
      .withColumn("_pairHex", concat(le16(col("amp")), le16(lit(65536) - col("amp"))))
      .withColumn("_oddHex", le16(col("amp")))
      .withColumn("_nPairs", (col("n") / 2).cast("int"))
      .withColumn("_toneHex", expr(
        "concat(repeat(_pairHex, _nPairs), if(n % 2 = 1, _oddHex, ''))"))
      .withColumn("_pcmHex", expr(
        "concat(repeat('0000', z1), _toneHex, repeat('0000', z2))"))
    val headerHex = concat(
      tagHex("RIFF"), le32(lit(36) + col("_dbytes")), tagHex("WAVE"),
      tagHex("fmt "), le32(lit(16)),
      le16(lit(1)), le16(lit(1)),            // PCM, mono
      le32(lit(8000)), le32(lit(16000)),     // rate, byte rate
      le16(lit(2)), le16(lit(16)),           // block align, bits
      tagHex("data"), le32(col("_dbytes")))
    val built = mid.withColumn("_payload0",
      unhex(concat(headerHex, col("_pcmHex"))))
    // damage pass: %9==0 → data chunk cut 6 bytes short (declared
    // size outruns the buffer — the truncation signal a chunk walker
    // must catch); %9==4 → RIFF magic stomped
    val damaged = built.withColumn("payload",
      when(col("doc_id") % 9 === 0,
        col("_payload0").substr(lit(1),
          (length(col("_payload0")) - 6).cast("int")))
      .when(col("doc_id") % 9 === 4,
        concat(unhex(lit("5858")),
          col("_payload0").substr(lit(3), length(col("_payload0")).cast("int"))))
      .otherwise(col("_payload0")))
    damaged.select(col("doc_id"), col("payload"),
      col("z1"), col("n"), col("z2"), col("amp"))
  }
}

/** Deterministic in-plan AVI synthesizer for the d97 gate — the video
  * member of the [[ImageSim]]/[[AudioSim]] family: every doc becomes a
  * REAL RIFF/AVI file (hdrl LIST with avih + strl/strh/strf headers,
  * movi LIST of 00db uncompressed 24-bit DIB frames with 4-byte row
  * padding) built byte-exact from hex/unhex Column expressions.
  * Per-frame solid BGR colors vary by a closed-form recurrence the SQL
  * oracle replays; doc_id % 11 ∈ {0, 5} payloads are damaged
  * (truncated mid-frame / 'AVI ' form tag stomped) to exercise the
  * quarantine path. */
object VideoSim {

  private def hb(c: Column): Column = lpad(hex(c % 256), 2, "0")
  private def le16(x: Column): Column = concat(hb(x), hb(x / 256))
  private def le32(x: Column): Column = concat(
    hb(x), hb(x / 256), hb(x / 65536), hb(x / 16777216))
  private def tagHex(s: String): Column =
    lit(s.getBytes("US-ASCII").map(b => f"$b%02X").mkString)
  private def zeros(n: Int): Column = lit("00" * n)

  /** doc_id → (payload, plus the closed-form ground-truth columns the
    * spec asserts against; the gate ships doc_id+payload only). */
  def payloads(docs: DataFrame): DataFrame = {
    val k = col("doc_id")
    val base = docs.select(
      k.as("doc_id"),
      (lit(1) + k % 4).cast("int").as("nf"),   // 1..4 frames
      (lit(4) + k % 5).cast("int").as("w"),    // 4..8 px wide
      (lit(2) + k % 3).cast("int").as("h"))    // 2..4 px tall
      .withColumn("_rb", ((col("w") * 3 + 3) / 4).cast("int") * 4)
      .withColumn("_pad", col("_rb") - col("w") * 3)
      .withColumn("_fb", col("_rb") * col("h"))
    val avih = concat(tagHex("avih"), le32(lit(56)),
      le32(lit(33333)), le32(lit(0)), le32(lit(0)), le32(lit(0)),
      le32(col("nf")), le32(lit(0)), le32(lit(1)), le32(col("_fb")),
      le32(col("w")), le32(col("h")), zeros(16))
    val strh = concat(tagHex("strh"), le32(lit(56)),
      tagHex("vids"), tagHex("DIB "), le32(lit(0)), le16(lit(0)), le16(lit(0)),
      le32(lit(0)), le32(lit(1)), le32(lit(30)), le32(lit(0)),
      le32(col("nf")), le32(col("_fb")), le32(lit(0)), le32(lit(0)), zeros(8))
    val strf = concat(tagHex("strf"), le32(lit(40)),
      le32(lit(40)), le32(col("w")), le32(col("h")), le16(lit(1)), le16(lit(24)),
      le32(lit(0)), le32(col("_fb")), le32(lit(0)), le32(lit(0)),
      le32(lit(0)), le32(lit(0)))
    val strl = concat(tagHex("LIST"), le32(lit(116)), tagHex("strl"), strh, strf)
    val hdrl = concat(tagHex("LIST"), le32(lit(192)), tagHex("hdrl"), avih, strl)
    // movi: nf frames of 00db chunks; per-frame solid BGR color from
    // the closed-form recurrence; rows pad to 4 bytes with zero bytes
    val mid = base
      .withColumn("_chunkHdrHex", concat(tagHex("00db"), le32(col("_fb"))))
      .withColumn("_framesHex", expr(
        """array_join(transform(sequence(0, nf - 1), f ->
          | concat(_chunkHdrHex,
          |   repeat(concat(repeat(concat(
          |     lpad(hex((doc_id * 7 + f * 13) % 256), 2, '0'),
          |     lpad(hex((doc_id * 11 + f * 17) % 256), 2, '0'),
          |     lpad(hex((doc_id * 13 + f * 19) % 256), 2, '0')), w),
          |     repeat('00', _pad)), h))), '')""".stripMargin.replaceAll("\n", " ")))
    val moviContent = lit(4) + col("nf") * (col("_fb") + 8)
    val riffSize = lit(4) + lit(200) + lit(8) + moviContent
    val built = mid.withColumn("_payload0", unhex(concat(
      tagHex("RIFF"), le32(riffSize), tagHex("AVI "),
      hdrl,
      tagHex("LIST"), le32(moviContent), tagHex("movi"),
      col("_framesHex"))))
    // damage pass: %11==0 → truncated mid-frame (the last 6 payload
    // bytes cut — the movi LIST now outruns the buffer); %11==5 →
    // 'AVI ' form tag stomped
    val damaged = built.withColumn("payload",
      when(col("doc_id") % 11 === 0,
        col("_payload0").substr(lit(1),
          (length(col("_payload0")) - 6).cast("int")))
      .when(col("doc_id") % 11 === 5,
        concat(col("_payload0").substr(lit(1), lit(8)),
          unhex(lit("58585858")),
          col("_payload0").substr(lit(13),
            (length(col("_payload0")) - 12).cast("int"))))
      .otherwise(col("_payload0")))
    damaged.select(col("doc_id"), col("payload"),
      col("nf"), col("w"), col("h"), col("_fb").as("fb"))
  }
}
