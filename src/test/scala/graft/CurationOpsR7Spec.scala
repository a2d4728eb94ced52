package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AudioSim, Multimodal, TextOps, Retrieval}

/** The r7 additions: rank-space hybrid fusion (d90), encoding-artifact
  * repair (d91), global curriculum ordering (d92), and the real WAV
  * decode with silence-trim stats (d93). */
class CurationOpsR7Spec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  // ---- d90: reciprocal-rank fusion -------------------------------

  test("rrfFuse: hand-computed integer contributions, both-list docs first") {
    // query 1: lexical ranks docs 10,11,12; dense ranks 11,13
    val lex = Seq((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L))
      .toDF("q_id", "rank", "doc_id")
    val dense = Seq((1L, 1L, 11L), (1L, 2L, 13L))
      .toDF("q_id", "rank", "doc_id")
    val out = Retrieval.rrfFuse(Seq(lex, dense), k = 10)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect()
    def c(r: Long) = 1000000000L / (60L + r)
    // doc 11: lex rank 2 + dense rank 1 — beats doc 10 (lex rank 1
    // only); doc 13 (dense rank 2, c(2)) outscores doc 12 (lex rank
    // 3, c(3)) since c is decreasing in rank
    assert(out.map(_._3).toSeq == Seq(11L, 10L, 13L, 12L))
    assert(out.head == ((1L, 1L, 11L, c(2) + c(1))))
    assert(out(1)._4 == c(1))
    assert(out(2)._4 == c(2) && out(3)._4 == c(3))
  }

  test("rrfFuse: equal fused scores break toward the smaller doc_id") {
    val a = Seq((1L, 1L, 20L), (1L, 2L, 30L)).toDF("q_id", "rank", "doc_id")
    val b = Seq((1L, 2L, 20L), (1L, 1L, 30L)).toDF("q_id", "rank", "doc_id")
    val out = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._3).toSeq == Seq(20L, 30L))
    assert(out(0)._4 == out(1)._4)
  }

  // ---- d91: encoding repair --------------------------------------

  private def fix(texts: String*) = {
    texts.toDF("text").select(TextOps.fixEncoding(col("text")).as("f"))
      .select("f.fixed", "f.n_mojibake", "f.n_replacement",
        "f.n_zero_width", "f.n_nbsp")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
  }

  test("fixEncoding: each damage class is repaired and counted") {
    val moji = "caf\u00C3\u00A9 ni\u00C3\u00B1o" // cafe/nino mojibake
    val Seq((fixed, nm, nr, nz, nn)) = fix(moji)
    assert(fixed == "caf\u00E9 ni\u00F1o")
    assert((nm, nr, nz, nn) == ((2L, 0L, 0L, 0L)))

    val mixed = "a\uFFFDb\u00A0c\u200Bd\uFEFF"
    val Seq((f2, m2, r2, z2, n2)) = fix(mixed)
    assert(f2 == "ab cd")
    assert((m2, r2, z2, n2) == ((0L, 1L, 2L, 1L)))
  }

  test("fixEncoding: clean text is untouched with zero counts (idempotent)") {
    val clean = "plain ascii text, nothing to fix"
    val Seq((fixed, nm, nr, nz, nn)) = fix(clean)
    assert(fixed == clean && nm + nr + nz + nn == 0)
    // repairing repaired text changes nothing further
    val Seq((fixed2, m2, r2, z2, n2)) = fix(fixed)
    assert(fixed2 == fixed && m2 + r2 + z2 + n2 == 0)
  }

  test("fixEncoding: double-encoded NBSP collapses via the pair table") {
    // Â+NBSP is the 2-char mojibake of NBSP — one pair fix to a space
    val Seq((fixed, nm, _, _, nn)) = fix("x\u00C2\u00A0y")
    assert(fixed == "x y" && nm == 1 && nn == 0)
  }

  // ---- d92: curriculum order -------------------------------------

  test("curriculumOrder: positions are the exact global row_number over (bin, hash, id)") {
    import org.apache.spark.sql.expressions.Window
    val docs = (0L until 500L).map(i => (i, i % 4)).toDF("doc_id", "bin")
    val out = TextOps.curriculumOrder(docs, col("doc_id"), col("bin"))
    val ref = docs.select(col("doc_id"), col("bin"),
      (row_number().over(Window.orderBy(col("bin"),
        graft.operators.Sampling.bucket(col("doc_id")), col("doc_id")))
        - 1).cast("long").as("pos"))
    assert(out.except(ref).count() == 0 && ref.except(out).count() == 0)
    // and the positions are a permutation of 0..n-1
    assert(out.agg(min("pos"), max("pos"), countDistinct("pos"))
      .as[(Long, Long, Long)].head() == ((0L, 499L, 500L)))
  }

  test("curriculumOrder: repartition-invariant") {
    val docs = (0L until 300L).map(i => (i, i % 3)).toDF("doc_id", "bin")
    val a = TextOps.curriculumOrder(docs, col("doc_id"), col("bin"))
    val b = TextOps.curriculumOrder(docs.repartition(17), col("doc_id"), col("bin"))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  // ---- d93: WAV decode -------------------------------------------

  private def wav(samples: Seq[Int], extraChunk: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >> 16) & 0xFFFF) }
    def tag(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val extra = if (extraChunk) 8 + 4 else 0
    tag("RIFF"); w32(36 + extra + samples.size * 2); tag("WAVE")
    tag("fmt "); w32(16); w16(1); w16(1); w32(8000); w32(16000); w16(2); w16(16)
    if (extraChunk) { tag("LIST"); w32(4); tag("INFO") }
    tag("data"); w32(samples.size * 2)
    samples.foreach(w16)
    bos.toByteArray
  }

  test("decodeWav: round-trips a hand-built clip, LIST chunk skipped") {
    val samples = Seq(0, 0, 700, -700, 700, 0)
    val Some(f) = Multimodal.decodeWav(wav(samples, extraChunk = true))
    assert(f.toSeq == Seq(6L, 2L, 1L, 2100L, 700L))
  }

  test("decodeWav: all-silent clip is all lead, no trail") {
    val Some(f) = Multimodal.decodeWav(wav(Seq(0, 1, -1)))
    assert(f.toSeq == Seq(3L, 3L, 0L, 2L, 1L))
  }

  test("decodeWav: quarantines truncation, bad magic, and non-PCM fmt") {
    val good = wav(Seq(0, 500, 0))
    assert(Multimodal.decodeWav(good).isDefined)
    assert(Multimodal.decodeWav(good.dropRight(3)).isEmpty)
    val stomped = good.clone(); stomped(0) = 'X'.toByte
    assert(Multimodal.decodeWav(stomped).isEmpty)
    val nonPcm = good.clone(); nonPcm(20) = 3.toByte // fmt code 3 = float
    assert(Multimodal.decodeWav(nonPcm).isEmpty)
  }

  test("AudioSim payloads decode to the closed-form ground truth") {
    val docs = (0L until 60L).toDF("doc_id")
    val p = AudioSim.payloads(docs)
    val out = Multimodal.audioStats(spark, p)
      .orderBy("doc_id").collect()
    out.foreach { r =>
      val id = r.getLong(0)
      val z1 = 2 + id % 5; val n = 4 + id % 7
      val z2 = 1 + (id * 3) % 4; val amp = 500 + (id * 37) % 2000
      val full = 44 + 2 * (z1 + n + z2)
      if (id % 9 == 0 || id % 9 == 4) {
        assert(r.getString(1) == "quarantined" && r.isNullAt(2))
        assert(r.getLong(7) == (if (id % 9 == 0) full - 6 else full))
      } else {
        assert(r.getString(1) == "ok")
        assert(r.getLong(2) == z1 + n + z2)
        assert(r.getLong(3) == z1 && r.getLong(4) == z2)
        assert(r.getLong(5) == n * amp && r.getInt(6) == amp)
        assert(r.getLong(7) == full)
      }
    }
  }

  // ---- d94: NFKC normalization ------------------------------------

  test("nfkc_normalize: compatibility folds, idempotence, null safety") {
    import graft.functions.NfkcNormalizeExpr
    val data = Seq(
      (1L, "con\uFB01g \uFF21lpha 10\u00B2\u3000end"), // all four classes
      (2L, "plain ascii, untouched"),
      (3L, "caf\u00E9 d\u00E9j\u00E0"), // composed accents: NFKC-invariant
      (4L, null))
    val out = data.toDF("id", "t")
      .select(col("id"), NfkcNormalizeExpr.column(col("t")).as("n"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out(0)._2 == "config Alpha 102 end")
    assert(out(1)._2 == "plain ascii, untouched")
    assert(out(2)._2 == "caf\u00E9 d\u00E9j\u00E0")
    assert(out(3)._2 == null)
    // idempotent: a second pass changes nothing
    val twice = data.toDF("id", "t")
      .select(col("id"), NfkcNormalizeExpr.column(
        NfkcNormalizeExpr.column(col("t"))).as("n"))
      .orderBy("id").as[(Long, String)].collect()
    assert(twice.map(_._2).toSeq == out.map(_._2).toSeq)
    // decomposed e + combining acute RECOMPOSES under NFKC
    val Seq((_, rec)) = Seq((1L, "e\u0301")).toDF("id", "t")
      .select(col("id"), NfkcNormalizeExpr.column(col("t")).as("n"))
      .as[(Long, String)].collect().toSeq
    assert(rec == "\u00E9")
  }

  test("normalizeNfkc gate: counts probe the corrupted text exactly") {
    val docs = Seq((1L, "\uFB01sh \uFF21 \u00B2\u3000\u3000")).toDF("doc_id", "text")
    val r = graft.operators.TextOps.normalizeNfkc(docs, col("text"), col("doc_id"))
      .collect()(0)
    assert(r.getString(1) == "fish A 2  ")
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((1L, 1L, 1L, 2L)))
    assert(r.getBoolean(6))
  }

  // ---- d95: soft dedup --------------------------------------------

  test("softWeights: cluster mass ~1e6 regardless of multiplicity") {
    import graft.operators.Dedup
    val assign = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 40L))
      .toDF("id", "cluster")
    val out = Dedup.softWeights(assign, col("id"), col("cluster"))
      .orderBy("_id")
      .as[(Long, Long, Long, Long)].collect()
    // triple cluster: each member 1e6 div 3; singleton keeps full weight
    assert(out.take(3).forall { case (_, c, sz, w) =>
      c == 10L && sz == 3L && w == 333333L })
    assert(out(3) == ((4L, 40L, 1L, 1000000L)))
    // per-cluster mass is within floor rounding of the scale
    val mass = Dedup.softWeights(assign, col("id"), col("cluster"))
      .groupBy("_cluster").agg(sum("weight").as("m"), count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect()
    mass.foreach { case (_, m, n) =>
      assert(m <= 1000000L && m > 1000000L - n) }
  }

  test("softWeights: null-cluster rows keep full weight, never dropped") {
    import graft.operators.Dedup
    val assign = Seq((1L, Some(10L)), (2L, Some(10L)), (3L, None), (4L, None))
      .toDF("id", "cluster")
    val out = Dedup.softWeights(assign, col("id"), col("cluster"))
      .orderBy("_id").as[(Long, Option[Long], Long, Long)].collect()
    // each unclustered (NULL) doc is its OWN size-1 cluster with full
    // weight — lumping them into one pseudo-cluster would hand a
    // mostly-unique corpus ~zero weight per unique doc
    assert(out.length == 4)
    assert(out(2) == ((3L, None, 1L, 1000000L)))
    assert(out(3) == ((4L, None, 1L, 1000000L)))
  }

  test("nfkc_normalize and deflate_len are callable from SQL") {
    graft.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT nfkc_normalize('con\uFB01g \uFF212') AS n, " +
        "deflate_len('aaaaaaaaaaaaaaaaaaaaaaaa') < 24 AS compresses")
      .collect()(0)
    assert(r.getString(0) == "config A2")
    assert(r.getBoolean(1))
  }

  // ---- d96: pack manifest -----------------------------------------

  test("packManifest: offsets abut, totals agree, fill is the integer ratio") {
    import graft.operators.TextOps
    val docs = (0L until 200L).map(i => (i, s"s${i % 3}", 100L + i % 7))
      .toDF("doc_id", "source", "n_tokens")
    val m = TextOps.packManifest(docs, col("source"), col("doc_id"),
      col("n_tokens"), budget = 512L).cache()
    // within each pack, ordered by doc_id, ranges abut from 0
    val rows = m.orderBy("stream", "pack_id", "doc_id")
      .select("stream", "pack_id", "off_start", "off_end", "n_tokens",
        "pack_tokens", "n_docs", "fill_ppm")
      .collect()
    rows.groupBy(r => (r.getString(0), r.getLong(1))).foreach { case (_, rs) =>
      var expect = 0L
      rs.foreach { r =>
        assert(r.getLong(2) == expect && r.getLong(3) == expect + r.getLong(4))
        expect = r.getLong(3)
      }
      assert(rs.head.getLong(5) == expect && rs.head.getLong(6) == rs.length.toLong)
      assert(rs.head.getLong(7) == expect * 1000000L / 512L)
    }
    // pack ids match the two-phase packer exactly
    val want = TextOps.packBudgetScalable(docs, col("source"), col("doc_id"),
      col("n_tokens"), 512L).select("doc_id", "pack_id")
    assert(m.select("doc_id", "pack_id").except(want).count() == 0)
    m.unpersist()
  }

  // ---- d97: AVI decode --------------------------------------------

  test("VideoSim payloads decode to the closed-form ground truth") {
    import graft.operators.VideoSim
    val docs = (0L until 44L).toDF("doc_id")
    val out = Multimodal.videoStats(spark, VideoSim.payloads(docs))
      .orderBy("doc_id").collect()
    assert(out.length == 44)
    out.foreach { r =>
      val id = r.getLong(0)
      val nf = 1 + id % 4; val w = 4 + id % 5; val h = 2 + id % 3
      val rb = ((w * 3 + 3) / 4) * 4; val fb = rb * h
      val full = 224 + nf * (fb + 8)
      if (id % 11 == 0 || id % 11 == 5) {
        assert(r.getString(1) == "quarantined" && r.isNullAt(2), s"doc $id")
        assert(r.getLong(8) == (if (id % 11 == 0) full - 6 else full))
      } else {
        assert(r.getString(1) == "ok", s"doc $id")
        assert(r.getLong(2) == nf && r.getInt(3) == w && r.getInt(4) == h)
        def cs(a: Long, b: Long) =
          (0L until nf).map(f => (id * a + f * b) % 256).sum * w * h
        assert(r.getLong(5) == cs(7, 13), s"doc $id sum_b")
        assert(r.getLong(6) == cs(11, 17), s"doc $id sum_g")
        assert(r.getLong(7) == cs(13, 19), s"doc $id sum_r")
        assert(r.getLong(8) == full)
      }
    }
  }

  test("decodeAvi rejects non-DIB formats and frame-count mismatches") {
    import graft.operators.VideoSim
    val one = Multimodal.videoStats(spark,
      VideoSim.payloads(Seq(1L).toDF("doc_id"))).collect()(0)
    assert(one.getString(1) == "ok")
    val payload = VideoSim.payloads(Seq(1L).toDF("doc_id"))
      .select("payload").collect()(0).getAs[Array[Byte]](0)
    // stomp the strf bit count (24 -> 8): quarantined as non-DIB
    // strf data starts after RIFF(12) + LIST hdrl hdr(12) + avih(64)
    // + LIST strl hdr(12) + strh(64) + strf hdr(8); bitcount at +14
    val bad = payload.clone()
    val strfData = 12 + 12 + 64 + 12 + 64 + 8
    assert((bad(strfData + 14) & 0xFF) == 24)
    bad(strfData + 14) = 8.toByte
    assert(Multimodal.decodeAvi(bad).isEmpty)
    // lie about the frame count in avih (dwTotalFrames at avih data +16)
    val lied = payload.clone()
    val avihData = 12 + 12 + 8
    lied(avihData + 16) = (lied(avihData + 16) + 1).toByte
    assert(Multimodal.decodeAvi(lied).isEmpty)
    assert(Multimodal.decodeAvi(payload).isDefined)
  }

  test("decodeStats sums stay exact beyond the float-mean precision horizon") {
    // 300x300 = 90k pixels: reconstructing the sum from a Float mean
    // is off by hundreds here (24-bit mantissa); the decoders must
    // return exact longs. Build a PPM whose channel sums are known.
    val w = 300; val h = 300
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](w * h * 3)
    var i = 0; var sr = 0L; var sg = 0L; var sb = 0L
    while (i < w * h) {
      val r = (i * 31 + 7) % 256; val g = (i * 17 + 3) % 256; val b = (i * 13 + 11) % 256
      px(3 * i) = r.toByte; px(3 * i + 1) = g.toByte; px(3 * i + 2) = b.toByte
      sr += r; sg += g; sb += b
      i += 1
    }
    val payload = header ++ px
    val Some(f) = Multimodal.decodePpmSums(payload)
    assert(f.toSeq == Seq(w.toLong, h.toLong, sr, sg, sb))
    // the full stage path agrees, and a NULL payload quarantines
    // instead of NPE-ing the task
    val df = Seq((1L, payload), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeStats(spark, df).orderBy("doc_id").collect()
    assert(out(0).getString(1) == "ok" && out(0).getLong(4) == sr
      && out(0).getLong(5) == sg && out(0).getLong(6) == sb)
    assert(out(1).getString(1) == "quarantined" && out(1).getLong(7) == 0L)
  }
}
