package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Spark 4 defaults `spark.sql.ansi.enabled=true`. graft's own sessions
  * pin it off (Tables.session), but a reference user will call these
  * operators from their OWN default session — so every operator whose
  * arithmetic could overflow or whose casts could see junk must behave
  * identically under ANSI, not die with ARITHMETIC_OVERFLOW / CAST_
  * INVALID_INPUT. This suite runs the risk-bearing operators in an
  * ANSI child session (shared context, independent SQLConf). */
class AnsiRobustnessSpec extends AnyFunSuite {

  lazy val base = SparkTestSession.get
  lazy val spark = {
    val s = base.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    s
  }

  val dir = "/root/testdata/sf0.001"

  test("Sampling.bucket survives ANSI for ids across the full long range") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 4294967295L, 4294967296L, Long.MaxValue / 2,
      Long.MaxValue - 1).toDF("id")
    val got = ids.select(col("id"), Sampling.bucket(col("id")).as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cross-check against exact BigInt arithmetic (the documented contract)
    got.foreach { case (id, b) =>
      val want = ((BigInt(id) * BigInt(2654435761L)) mod BigInt(4294967296L))
        .toLong % 1000000L
      assert(b == want, s"bucket($id)")
    }
  }

  test("text/dedup/similarity operators run under ANSI on real data") {
    val docs = Tables.load(spark, dir, "documents")
    val emb = Tables.load(spark, dir, "embeddings")
    assert(TextOps.qualityMetrics(docs, col("text")).count() > 0)
    assert(docs.select(TextOps.fingerprint(col("text"))).count() > 0)
    assert(Dedup.minhashCandidates(docs, col("text"), col("doc_id")).count() >= 0)
    assert(Dedup.polyMinhashPairs(docs, col("text"), col("doc_id")).count() >= 0)
    assert(Dedup.simhashFingerprints(docs, col("text"), col("doc_id")).count() > 0)
    assert(Similarity.quantizationReport(emb).count() > 0)
    assert(Similarity.lshTopK(emb, emb.filter(col("vec_id") < 3), 5).count() > 0)
    assert(Multimodal.sampleFrames(Multimodal.withPayload(docs)).count() > 0)
    assert(TextOps.tfidfTopTerms(docs, col("text"), col("doc_id"), 3).count() > 0)
    val nTok = size(TextOps.tokens(col("text")))
    assert(TextOps.importanceWeights(docs, docs.filter(col("lang") === "en"),
      col("text"), col("doc_id")).count() > 0)
    assert(TextOps.assignShards(docs, col("doc_id"), nTok, 512L).count() > 0)
    assert(Sampling.domainMix(docs, col("lang"), col("doc_id"), nTok,
      Map("en" -> 1L), 1000L).count() >= 0)
    assert(Dedup.crossNearDup(docs,
      docs.limit(5).select(col("doc_id").as("bid"), col("text").as("bt")),
      col("text"), col("doc_id"), col("bt"), col("bid")).count() > 0)
    assert(docs.select(TextOps.normalizeText(col("text"))).count() > 0)
    assert(TextOps.corpusReport(docs, col("text"), col("source")).count() > 0)
    assert(TextOps.lengthFilter(docs, col("text"), col("lang"),
      col("doc_id")).count() > 0)
    assert(Sampling.hashReservoir(docs, col("lang"), col("doc_id"), 3)
      .count() > 0)
    assert(TextOps.qualityFilterThreshold(docs, col("text"), col("lang"),
      col("doc_id"), 0.5).count() > 0)
    assert(TextOps.dedupLinesGlobal(docs, col("doc_id"), col("text"))
      .count() > 0)
    assert(Similarity.semanticSurvivors(emb, nCells = 4, iters = 1)
      .count() > 0)
    assert(Dedup.polySimhashPairs(docs, col("text"), col("doc_id")).count() >= 0)
    assert(Dedup.corpusOverlap(docs, col("text"), col("source")).count() > 0)
    assert(Dedup.snapshotDiff(docs.limit(50), docs, col("text")).count() > 0)
    assert(Dedup.cutDupSpans(docs, col("text"), col("doc_id")).count() > 0)
    assert(TextOps.chunkTokens(docs, col("text"), col("doc_id"), 64, 48).count() > 0)
    assert(Sampling.resampleByWeight(
      docs.select(col("doc_id"), lit(Long.MaxValue / 2).as("w")),
      col("doc_id"), col("w"), tau = 1500000L).count() > 0)
    assert(Retrieval.bm25TopK(docs, col("text"), col("doc_id"),
      docs.filter(col("doc_id") % 97 === 0), col("text"), col("doc_id"),
      5).count() > 0)
    assert(Components.pageRank(
      docs.select(col("doc_id").as("src"),
        pmod(col("doc_id"), lit(50L)).as("dst")), iters = 2).count() > 0)
    assert(Sampling.clusterSplit(
      docs.select(col("doc_id")), col("doc_id"), col("doc_id"))
      .count() > 0)
    assert(TextOps.bigramLmScore(docs, docs.filter(col("lang") === "en"),
      col("text"), col("doc_id")).count() > 0)
    assert(Profile.numeric(docs, Seq("doc_id", "n_chars")).count() > 0)
    assert(Profile.histogram(docs, col("n_chars"), 100.0).count() > 0)
    assert(Retrieval.bm25FromIndex(
      Retrieval.postings(docs, col("text"), col("doc_id")),
      docs.filter(col("doc_id") % 97 === 0), col("text"), col("doc_id"),
      5).count() > 0)
    assert(Components.bestInCluster(
      docs.select(col("doc_id").as("id"), pmod(col("doc_id"), lit(7L)).as("label"),
        col("n_chars")), col("id"), col("label"), col("n_chars")).count() > 0)
    assert(Multimodal.phashPairs(docs, col("text"), col("doc_id"),
      maxBucket = Dedup.MAX_FULL_BUCKET).count() >= 0)
    assert(Dedup.crossNearDupLarge(docs,
      docs.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 7000000L).as("hist_id"), col("text")),
      col("text"), col("doc_id"), col("text"), col("hist_id"),
      maxBucket = Dedup.MAX_FULL_BUCKET).count() > 0)
    assert(Sampling.temperatureMix(docs, col("lang"), col("doc_id"),
      size(TextOps.tokens(col("text"))), budgetTokens = 3000L).count() > 0)
    val tk = TextOps.tokens(col("text"))
    assert(TextOps.classifierQuality(docs, col("text"), col("doc_id"),
      size(array_distinct(tk)) * 2 >= size(tk)).count() > 0)
    assert(Layout.zBlocks(docs, col("doc_id"), col("n_chars"),
      bits = 11, blockShift = 14).count() > 0)
    val e = Tables.load(spark, dir, "embeddings")
    assert(Similarity.semanticDecontam(e,
      e.filter(col("vec_id") % 17 === 0), threshold = 0.3).count() > 0)
    assert(TextOps.mergePairStats(docs, col("text"), topN = 10).count() == 10)
    assert(TextOps.difficultyBins(docs, col("n_chars"), col("lang"),
      col("doc_id"), nBins = 4).count() > 0)
    assert(TextOps.phraseFilter(docs, col("text"), col("doc_id"),
      Seq("the", "batch batch")).count() > 0)
    assert(Web.extractHtml(docs,
      concat(lit("<p>"), col("text"), lit("</p><a href=\"/x\">n</a>")),
      col("doc_id")).count() > 0)
    assert(TextOps.bpeTrain(docs, col("text"), rounds = 2).count() == 2)
  }

  test("bloom, poly-hash and PQ expressions run under ANSI in a foreign session") {
    import org.apache.spark.sql.functions.{lit, xxhash64}
    val docs = Tables.load(spark, dir, "documents")
    // session-independent custom expressions (built via the Expression
    // bridge, not the per-session registry) must analyze + run in a
    // session that never called GraftFunctions.register
    val bytes = docs.agg(graft.functions.BloomFilterAgg.column(
      xxhash64(col("text")), lit(1000L), lit(0.01)).as("bf"))
      .head.getAs[Array[Byte]]("bf")
    assert(docs.filter(!graft.functions.BloomContainsExpr.column(
      xxhash64(col("text")), lit(bytes))).count() == 0)
    assert(docs.select(graft.functions.PolyTokenHashExpr.column(col("text")))
      .count() > 0)
    assert(docs.select(graft.functions.DeflateLenExpr.column(col("text")).as("dl"))
      .filter(col("dl") > 0).count() > 0)
    assert(Dedup.dupSpans(docs, col("text"), col("doc_id")).count() > 0)
    val emb = Tables.load(spark, dir, "embeddings")
    assert(Similarity.pqTopK(emb, emb.filter(col("vec_id") < 3), 5,
      m = 4, codes = 8, iters = 1).count() > 0)
    // literal-map scoring twins: every doc here has features/bigrams
    // ABSENT from the tiny models — under ANSI a bare element_at would
    // throw MAP_KEY_DOES_NOT_EXIST; the miss → default path is the
    // documented contract
    val clf = graft.streaming.EventStream.classifierScored(docs,
      col("text"), col("doc_id"), Map(0L -> 600000L)).collect()
    assert(clf.nonEmpty && clf.forall(_.getLong(2) >= 0L))
    val lm = graft.streaming.EventStream.lmScored(docs, col("text"),
      col("doc_id"), Map("zz qq" -> -1000000L), Map("zz" -> -500000L),
      defaultScore = -2000000L)
    assert(lm.count() > 0)
    // r7 additions under ANSI: NFKC expression, encoding repair, the
    // WAV decode chain (payload synthesis uses % / division on longs)
    assert(docs.select(graft.functions.NfkcNormalizeExpr.column(col("text")))
      .count() > 0)
    assert(TextOps.repairEncoding(docs, col("text"), col("doc_id"))
      .filter(!col("was_dirty")).count() > 0)
    val wav = Multimodal.audioStats(spark,
      AudioSim.payloads(docs.select(col("doc_id")).limit(40)))
    assert(wav.filter(col("status") === "ok").count() > 0)
    // r11 additions under ANSI: the PNG decode chain (CRC/inflate/
    // filter arithmetic) and the unigram trainer + native encode
    // expression (quantized log-prob integer math, substring DP)
    val png = graft.operators.PngCodec.pngStats(spark,
      graft.operators.PngSim.payloads(docs.select(col("doc_id")).limit(42)))
    assert(png.filter(col("status") === "ok").count() > 0)
    assert(png.filter(col("status") === "quarantined").count() > 0)
    // and the JPEG chain (Huffman/IDCT/color-convert arithmetic)
    val jpg = graft.operators.JpegSim.stats(spark,
      graft.operators.JpegSim.payloads(docs.select(col("doc_id")).limit(42)))
    assert(jpg.filter(col("status") === "ok").count() > 0)
    assert(jpg.filter(col("status") === "quarantined").count() > 0)
    // and the GIF chain (LZW width/dictionary arithmetic)
    val gif = graft.operators.GifSim.stats(spark,
      graft.operators.GifSim.payloads(docs.select(col("doc_id")).limit(42)))
    assert(gif.filter(col("status") === "ok").count() > 0)
    assert(gif.filter(col("status") === "quarantined").count() > 0)
    // and the μ-law chain (G.711 expand shift/complement arithmetic)
    val mul = graft.operators.MulawSim.stats(spark,
      graft.operators.MulawSim.payloads(docs.select(col("doc_id")).limit(42)))
    assert(mul.filter(col("status") === "ok").count() > 0)
    assert(mul.filter(col("status") === "quarantined").count() > 0)
    // and the tar-shard walk (octal parse, checksum arithmetic)
    val tar = graft.operators.TarSim.stats(spark,
      graft.operators.TarSim.payloads(docs.select(col("doc_id")).limit(42)))
    assert(tar.filter(col("status") === "ok").count() > 0)
    assert(tar.filter(col("status") === "quarantined").count() > 0)
    // and the gzip member walk (CRC-32/ISIZE trailer arithmetic)
    val gz = graft.operators.GzipSim.stats(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(gz.filter(col("status") === "ok").count() > 0)
    assert(gz.filter(col("status") === "quarantined").count() > 0)
    // and the WARC two-layer walk (gzip trailer + length framing)
    val warc = graft.operators.WarcSim.stats(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(warc.filter(col("status") === "ok").count() > 0)
    assert(warc.filter(col("status") === "quarantined").count() > 0)
    // and the MJPEG walk (container stride + per-frame JPEG decode)
    val mj = graft.operators.MjpegSim.stats(spark,
      graft.operators.MjpegSim.payloads(docs.select(col("doc_id")).limit(42)))
    assert(mj.filter(col("status") === "ok").count() > 0)
    assert(mj.filter(col("status") === "quarantined").count() > 0)
    // and the ADPCM walk (stateful step-table/clamp arithmetic)
    val ad = graft.operators.AdpcmSim.stats(spark,
      graft.operators.AdpcmSim.payloads(docs.select(col("doc_id")).limit(42)))
    assert(ad.filter(col("status") === "ok").count() > 0)
    assert(ad.filter(col("status") === "quarantined").count() > 0)
    // and the WET page extraction (codepoint slice arithmetic)
    val wet = graft.operators.WarcSim.pages(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(wet.count() > 0)
    // and the KMV sketch overlap (bottom-k agg + integer estimator)
    assert(Sketches.kmvOverlap(docs, col("text"), col("doc_id"))
      .count() == 2)
    // and the zip walk (directory offsets, CRC, inflate arithmetic)
    val zip = graft.operators.ZipSim.stats(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(zip.filter(col("status") === "ok").count() > 0)
    assert(zip.filter(col("status") === "quarantined").count() > 0)
    // and the crawl capstone (WET extraction + dedup + packing)
    assert(graft.queries.PipelineQueries.queries("d114_crawl_pipeline")(
      spark, dir).count() > 0)
    // and the LZ4 walk (frame offsets, xxh32, match-copy arithmetic)
    val lz = graft.operators.Lz4Sim.stats(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(lz.filter(col("status") === "ok").count() > 0)
    assert(lz.filter(col("status") === "quarantined").count() > 0)
    // and the .jsonl.zst reader (concat frames + from_json under ANSI)
    assert(graft.queries.PipelineQueries.queries("d119_jsonl_zst")(
      spark, dir).count() > 0)
    // and the zstd walk (FSE states, huff0 codes, xxh64 arithmetic)
    val zs = graft.operators.ZstdSim.stats(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(zs.filter(col("status") === "ok").count() > 0)
    assert(zs.filter(col("status") === "quarantined").count() > 0)
    // and the A-law chain (G.711 XOR/segment-shift arithmetic)
    val al = graft.operators.AlawSim.stats(spark,
      graft.operators.AlawSim.payloads(docs.select(col("doc_id")).limit(42)))
    assert(al.filter(col("status") === "ok").count() > 0)
    assert(al.filter(col("status") === "quarantined").count() > 0)
    // and the seekable range read (seek-table/frame-tiling arithmetic)
    val sk = graft.operators.ZstdSeekSim.stats(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(sk.filter(col("status") === "ok").count() > 0)
    assert(sk.filter(col("status") === "quarantined").count() > 0)
    // and the snappy walk (tag/copy/masked-CRC arithmetic)
    val sn = graft.operators.SnappySim.stats(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(sn.filter(col("status") === "ok").count() > 0)
    assert(sn.filter(col("status") === "quarantined").count() > 0)
    // and the deflate walk (Huffman/code-length/Adler arithmetic)
    val df124 = graft.operators.DeflateSim.stats(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(df124.filter(col("status") === "ok").count() > 0)
    assert(df124.filter(col("status") === "quarantined").count() > 0)
    // and the bzip2 walk (BWT/MTF/CRC arithmetic)
    val bz = graft.operators.Bzip2Sim.stats(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(bz.filter(col("status") === "ok").count() > 0)
    assert(bz.filter(col("status") === "quarantined").count() > 0)
    // and the chunked-HTTP walk (hex framing + content-coding chain)
    val ch = graft.operators.ChunkedSim.stats(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(ch.filter(col("status") === "ok").count() > 0)
    assert(ch.filter(col("status") === "quarantined").count() > 0)
    // and the charset sniff (byte-table + validation arithmetic)
    val cs = graft.operators.CharsetSim.stats(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(cs.filter(col("status") === "ok").count() > 0)
    assert(cs.filter(col("status") === "quarantined").count() > 0)
    // and the XML dump rows (bzip2 + nesting/entity arithmetic)
    val xr = graft.operators.XmlRowsSim.rows(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(xr.count() > 0)
    // and the parquet walk (thrift/RLE-hybrid/stats-audit arithmetic)
    val pq = graft.operators.ParquetSim.stats(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(pq.filter(col("status") === "ok").count() > 0)
    assert(pq.filter(col("status") === "quarantined").count() > 0)
    // and the eml/MIME rows (base64/QP/folding arithmetic)
    val em = graft.operators.EmlSim.rows(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(em.count() > 0)
    // and the robots verdicts (wildcard/precedence arithmetic)
    val rb = graft.operators.RobotsSim.rows(spark,
      docs.select(col("doc_id")).limit(42))
    assert(rb.count() > 0)
    // and the Avro container walk (zigzag/sync/map-block arithmetic)
    val av = graft.operators.AvroOcfSim.stats(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(av.filter(col("status") === "ok").count() > 0)
    assert(av.filter(col("status") === "quarantined").count() > 0)
    // and the tf.Example proto parse (varint/tag/nesting arithmetic)
    val tfe = graft.operators.TfExampleSim.stats(spark,
      docs.select(col("doc_id"), col("text")).limit(42))
    assert(tfe.filter(col("status") === "ok").count() > 0)
    assert(tfe.filter(col("status") === "quarantined").count() > 0)
    // and the TFRecord walk (masked CRC-32C rotation arithmetic)
    val tfr = graft.operators.TfRecordSim.stats(spark,
      graft.operators.TfRecordSim.payloads(docs.select(col("doc_id")).limit(42)))
    assert(tfr.filter(col("status") === "ok").count() > 0)
    assert(tfr.filter(col("status") === "quarantined").count() > 0)
    val traj = graft.operators.UnigramLm.train(docs, col("text"), rounds = 1)
    assert(traj.filter(col("round") === 1).count() > 0)
    val model = new graft.functions.UnigramModel(
      traj.filter(col("round") === 1).collect()
        .map(r => r.getString(1) -> r.getLong(2)).sortBy(_._1).toSeq)
    assert(docs.select(graft.functions.UnigramEncodeExpr
      .column(col("text"), model)).count() > 0)
  }

  test("quality metrics on an empty/whitespace doc stay null, not an ANSI error") {
    import spark.implicits._
    val df = Seq((1L, ""), (2L, "   "), (3L, "one two")).toDF("doc_id", "text")
    val got = TextOps.qualityMetrics(df, col("text")).collect()
    assert(got.length == 3) // no division-by-zero error; guarded nulls
  }

  test("slurm ingest parses the reference fixture under ANSI (junk fields -> null, not cast errors)") {
    val raw = graft.slurm.SacctSource.readCsv(spark,
      "/root/reference/tests/test-data1.csv", sep = "|")
    val slurm = graft.slurm.SlurmTable.build(raw)
    assert(slurm.count() > 0)
    // force every derived column to materialize (a lazy count() prunes)
    val row = slurm.agg(count(lit(1)),
      slurm.columns.map(c => count(col(c))).toSeq: _*).collect()
    assert(row.nonEmpty)
  }
}
