package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft._
import graft.operators._

/** Capstone-scale rehearsal (`graft.tools.ScaleRehearsal <sf> <N>
  * capstones`): the five composition capstones (d79, d84, d34, d68,
  * d82), the slurm warehouse lifecycle, and the dominant-stream
  * packing wall, each at 1× and N× replication with PER-STAGE
  * wall-times. The "all" mode sweeps individual operators; this mode
  * answers the judge's harder question — do the full CHAINS stay
  * ~linear when the corpus grows an order of magnitude past the gate
  * scale, and which stage bends first. Stage times are cumulative
  * (stage k's count() re-executes the lazy prefix — attribution =
  * consecutive deltas); the chain total is the last stage. */
object Capstones {

  private def time(n: String)(f: => Long): Double = {
    val t0 = System.nanoTime; val c = f
    val dt = (System.nanoTime - t0) / 1e9
    println(f"$n%-44s $dt%8.2f s  ($c rows)")
    dt
  }

  private def chainRatio(name: String, factor: Int,
                         stages: Seq[(String, DataFrame => Long)],
                         one: DataFrame, many: DataFrame): Unit = {
    println(s"== $name ==")
    val t1 = stages.map { case (sn, f) => time(s"  $sn 1x")(f(one)) }
    val tN = stages.map { case (sn, f) => time(s"  $sn ${factor}x")(f(many)) }
    stages.indices.foreach { i =>
      println(f"  -> ${stages(i)._1}%-28s ratio ${tN(i) / t1(i)}%6.1f (linear = $factor.0)")
    }
  }

  def run(spark: SparkSession, dir: String, factor: Int,
          only: Option[String] = None): Unit = {
    // `only` (4th CLI arg) names one chain — rerun a single rehearsal
    // without paying for the whole suite
    def want(tag: String): Boolean = only.forall(_ == tag)
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val docShift = base.agg(max("doc_id")).head.getLong(0) + 1
    val big = (0 until factor).map(i =>
      base.select((col("doc_id") + i * docShift).as("doc_id"),
        col("text"), col("lang"), col("source")))
      .reduce(_ unionByName _)
      .repartition(32).persist()
    println(s"corpus 1x=${base.count()} ${factor}x=${big.count()} docs")

    // ---- d79 curation v3: url gate -> exact dedup -> epoch repeat ->
    // token-balanced shards (the gate's chain, PipelineQueries:958)
    val blocked = Seq("blocked.net", "spam.example")
    def v3url(df: DataFrame) = {
      val u = concat(lit("https://sub"), pmod(col("doc_id"), lit(50)),
        lit(".example.co.uk/p/"), col("doc_id"),
        lit("?utm_source=x&id="), col("doc_id"))
      Web.curateUrls(df, u, col("doc_id"), blocked)
        .filter(col("kept")).select("doc_id")
    }
    def v3surv(df: DataFrame) = df.join(v3url(df), Seq("doc_id"), "left_semi")
    def v3uniq(df: DataFrame) = {
      val surv = v3surv(df)
      surv.join(Dedup.exact(surv, col("text"), col("doc_id"))
          .select(col("keeper_id").as("doc_id")), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("lang"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    }
    val epochs = Map("en" -> 800000L, "zh" -> 2500000L, "es" -> 1000000L,
      "de" -> 3250000L, "fr" -> 1750000L)
    def v3rep(df: DataFrame) = {
      val uniq = v3uniq(df)
      Sampling.epochRepeat(uniq, col("lang"), col("doc_id"), epochs)
        .join(uniq.select("doc_id", "n_tokens"), "doc_id")
    }
    def v3full(df: DataFrame) = TextOps.assignShards(v3rep(df),
      col("doc_id") * 8L + col("epoch"), col("n_tokens"), 4096L)
    if (want("d79")) chainRatio("d79 curation v3", factor, Seq(
      ("url gate", (d: DataFrame) => v3url(d).count()),
      ("+ exact dedup", (d: DataFrame) => v3uniq(d).count()),
      ("+ epoch repeat", (d: DataFrame) => v3rep(d).count()),
      ("+ shard prefix sum", (d: DataFrame) => v3full(d).count())),
      base, big)

    // ---- d84 curation v4: html extract -> phrase gate -> exact dedup
    // -> shards (PipelineQueries:997)
    def v4ext(df: DataFrame) = {
      val page = concat(lit("<html><body><nav><a href=\"/x\">m</a></nav><p>"),
        col("text"), lit("</p><!-- c --></body></html>"))
      Web.extractHtml(df.select(col("doc_id"), col("text")), page,
        col("doc_id"), withText = true)
        .filter(col("kept")).select(col("doc_id"), col("clean_text"))
    }
    def v4gated(df: DataFrame) = {
      val ext = v4ext(df)
      ext.join(TextOps.phraseFilter(ext, col("clean_text"), col("doc_id"),
          Seq("click here", "subscribe now", "the fast"))
        .filter(col("kept")).select("doc_id"), Seq("doc_id"), "left_semi")
    }
    def v4uniq(df: DataFrame) = {
      val g = v4gated(df)
      g.join(Dedup.exact(g, col("clean_text"), col("doc_id"))
          .select(col("keeper_id").as("doc_id")), Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          size(TextOps.tokens(col("clean_text"))).cast("long").as("n_tokens"))
    }
    def v4full(df: DataFrame) = TextOps.assignShards(v4uniq(df),
      col("doc_id"), col("n_tokens"), 4096L)
    if (want("d84")) chainRatio("d84 curation v4", factor, Seq(
      ("html extract", (d: DataFrame) => v4ext(d).count()),
      ("+ phrase gate", (d: DataFrame) => v4gated(d).count()),
      ("+ exact dedup", (d: DataFrame) => v4uniq(d).count()),
      ("+ shard prefix sum", (d: DataFrame) => v4full(d).count())),
      base, big)

    // ---- d34 near-dup chain: capped LSH candidates -> jaccard verify
    // -> connected components. Replication is the adversarial input:
    // every doc gains factor exact replicas, so every band bucket is
    // factor deep (the star cap bounds pair fan-out) and every
    // component is a factor-sized star (CC converges in 2 rounds).
    def d34cand(df: DataFrame) = Dedup.minhashCandidates(df, col("text"),
      col("doc_id"), maxBucket = Dedup.MAX_FULL_BUCKET)
    def d34edges(df: DataFrame) = Dedup.jaccardVerify(d34cand(df), df,
        col("text"), col("doc_id"), minJaccard = 0.5)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    def d34cc(df: DataFrame) = Components.connectedComponents(
      df.select(col("doc_id").as("id")), d34edges(df))
    if (want("d34")) chainRatio("d34 near-dup survivors", factor, Seq(
      ("LSH candidates (capped)", (d: DataFrame) => d34cand(d).count()),
      ("+ jaccard verify", (d: DataFrame) => d34edges(d).count()),
      ("+ connected components", (d: DataFrame) => d34cc(d).count())),
      base, big)

    // ---- d68 cross-corpus: history fixed at 1x/2, crawl grows Nx,
    // every crawl replica band-hits history (worst case)
    val hist = base.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 7000000L).as("hist_id"), col("text"))
    def d68(df: DataFrame) = Dedup.crossNearDupLarge(df, hist,
      col("text"), col("doc_id"), col("text"), col("hist_id"),
      maxBucket = Dedup.MAX_FULL_BUCKET).count()
    if (want("d68")) chainRatio("d68 cross-corpus near-dup", factor, Seq(
      ("capped band join", d68)), base, big)

    // ---- d82 BPE training: vocab is replication-invariant (same
    // words, freq xN) — only the one-time vocab build scans the
    // corpus; per-round work must NOT grow with the factor
    if (want("d82")) chainRatio("d82 bpe train (4 rounds)", factor, Seq(
      ("train", (d: DataFrame) => TextOps.bpeTrain(d, col("text"),
        rounds = 4).count())), base, big)

    // ---- dominant-stream packing: 90% of docs in ONE stream — the
    // window form serializes the hot stream through one task; the
    // two-phase form must stay flat-per-row (task #5 of the verdict)
    def packInput(df: DataFrame) = df.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(10)) =!= 0, lit("hot"))
        .otherwise(concat(lit("tail"), pmod(col("doc_id"), lit(7))))
        .as("stream"),
      (length(col("text")) / 4).cast("long").as("n_tokens"))
    if (want("pack")) {
    println("== dominant-stream packing (90% one stream) ==")
    val pw1 = time("  window form 1x")(TextOps.packBudget(packInput(base),
      col("stream"), col("doc_id"), col("n_tokens"), 4096L).count())
    val pwN = time(s"  window form ${factor}x")(TextOps.packBudget(packInput(big),
      col("stream"), col("doc_id"), col("n_tokens"), 4096L).count())
    val ps1 = time("  two-phase form 1x")(TextOps.packBudgetScalable(
      packInput(base), col("stream"), col("doc_id"), col("n_tokens"), 4096L).count())
    val psN = time(s"  two-phase form ${factor}x")(TextOps.packBudgetScalable(
      packInput(big), col("stream"), col("doc_id"), col("n_tokens"), 4096L).count())
    println(f"  -> window ratio ${pwN / pw1}%6.1f, two-phase ratio ${psN / ps1}%6.1f (linear = $factor.0)")
    }

    // ---- slurm warehouse lifecycle: ingest-write, rollups over the
    // materialized table, a resume merge, compaction — at Nx the day
    // count is fixed (same sim dates), so every day partition is Nx
    // deep: the write must parallelize WITHIN days (the
    // repartitionByRange layout) and the merge must stay bounded by
    // the batch's horizon
    if (want("slurm")) {
    val slurmBase = graft.slurm.SlurmTable.build(
      graft.slurm.SlurmSim.raw(spark, dir), lit(1750000000L))
      .repartition(32).persist()
    val slurmBig = (0 until factor).map(i =>
      slurmBase.withColumn("JobID", concat(lit(s"r$i."), col("JobID")))
        .withColumn("JobIDnostep", concat(lit(s"r$i."), col("JobIDnostep"))))
      .reduce(_ unionByName _).repartition(32).persist()
    println(s"slurm 1x=${slurmBase.count()} ${factor}x=${slurmBig.count()} rows")
    def whPath(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft_cap_wh_$tag").toString
    val wh1 = whPath("1x"); val whN = whPath("Nx")
    println("== slurm warehouse lifecycle ==")
    val w1 = time("  warehouse write 1x") {
      graft.slurm.SlurmWarehouse.write(slurmBase, wh1); slurmBase.count() }
    val wN = time(s"  warehouse write ${factor}x") {
      graft.slurm.SlurmWarehouse.write(slurmBig, whN); slurmBig.count() }
    def effCount(p: String) = graft.slurm.SlurmViews.eff(
      graft.slurm.SlurmWarehouse.read(spark, p)).count()
    val e1 = time("  eff rollup 1x")(effCount(wh1))
    val eN = time(s"  eff rollup ${factor}x")(effCount(whN))
    def seff(p: String) = graft.slurm.Reports.seffPerUser(
      graft.slurm.SlurmViews.eff(graft.slurm.SlurmWarehouse.read(spark, p))).count()
    val s1 = time("  seff per-user 1x")(seff(wh1))
    val sN = time(s"  seff per-user ${factor}x")(seff(whN))
    // resume merge: a same-sized re-report batch (0.5% of jobs, Time
    // bumped) — cost must track the batch/touched days, not the table
    def rereport(df: DataFrame) = df.filter(pmod(hash(col("JobID")), lit(200)) === 0)
      .withColumn("Time", col("Time") + 3600L)
    val m1 = time("  resume merge 1x")(
      { graft.slurm.SlurmWarehouse.mergeInto(spark, rereport(slurmBase), wh1); 1L })
    val mN = time(s"  resume merge ${factor}x")(
      { graft.slurm.SlurmWarehouse.mergeInto(spark, rereport(slurmBig), whN); 1L })
    val c1 = time("  compact 1x")(
      graft.slurm.SlurmWarehouse.compact(spark, wh1, minFiles = 1).size.toLong)
    val cN = time(s"  compact ${factor}x")(
      graft.slurm.SlurmWarehouse.compact(spark, whN, minFiles = 1).size.toLong)
    println(f"  -> write ${wN / w1}%5.1f  eff ${eN / e1}%5.1f  seff ${sN / s1}%5.1f" +
      f"  merge ${mN / m1}%5.1f  compact ${cN / c1}%5.1f  (linear = $factor.0)")
    }

    // ---- media decode (d93/d97): in-plan container synthesis + the
    // real chunk-walking parsers — map-only end to end, so 50× bytes
    // must ride the scan with no shuffle anywhere
    if (want("media")) {
      def wavs(df: DataFrame) = Multimodal.audioStats(spark,
        AudioSim.payloads(df.select(col("doc_id")))).count()
      def avis(df: DataFrame) = Multimodal.videoStats(spark,
        VideoSim.payloads(df.select(col("doc_id")))).count()
      chainRatio("media decode", factor, Seq(
        ("wav decode", wavs), ("avi decode", avis)), base, big)
    }

    // ---- d96 pack manifest: d19's two-phase packing + the bounded
    // (stream, pack)-partitioned offset/total windows — a pack holds
    // < budget + max_doc tokens by construction, so the added windows
    // must stay flat under the dominant-stream skew too
    if (want("manifest")) {
      def manifestIn(df: DataFrame) = df.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) =!= 0, lit("hot"))
          .otherwise(concat(lit("tail"), pmod(col("doc_id"), lit(7))))
          .as("stream"),
        (length(col("text")) / 4).cast("long").as("n_tokens"))
      chainRatio("d96 pack manifest (90% one stream)", factor, Seq(
        ("manifest", (d: DataFrame) => TextOps.packManifest(manifestIn(d),
          col("stream"), col("doc_id"), col("n_tokens"), 4096L).count())),
        base, big)
    }

    // ---- d92 curriculum order: per-lang quantile bins -> two-phase
    // global prefix sum (the d45 machinery keyed by bin). The total
    // order must come out of slice-local ranks: at Nx the single
    // remaining unpartitioned window still sees only the KB-sized
    // (bin, slice) offsets table, never the corpus
    if (want("d92")) {
      def cbins(df: DataFrame) = TextOps.difficultyBins(df,
        size(TextOps.tokens(col("text"))).cast("long"), col("lang"),
        col("doc_id"), nBins = 4)
      def corder(df: DataFrame) = TextOps.curriculumOrder(cbins(df),
        col("doc_id"), col("bin"))
      chainRatio("d92 curriculum order", factor, Seq(
        ("difficulty bins", (d: DataFrame) => cbins(d).count()),
        ("+ global order", (d: DataFrame) => corder(d).count())),
        base, big)
    }
  }
}
