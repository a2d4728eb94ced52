package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2.5):
  * language ID, quality scoring, token counting, fingerprinting. All
  * pure Catalyst expressions — map-only, no shuffle, codegen'd — so they
  * stream over a 100 TB corpus at scan speed.
  */
object TextOps {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Real subword tokenization (WordPiece greedy longest-match against
    * a literal vocab — see [[graft.functions.WordPieceEncodeExpr]]):
    * the token count a training budget is actually denominated in.
    * Map-only, vocab embedded as a codegen reference object (tokenizer
    * vocabs are ~1 MB — broadcast-bounded at any corpus size). */
  def subwordTokens(text: Column, vocab: graft.functions.WordPieceVocab): Column =
    graft.functions.WordPieceEncodeExpr.column(text, vocab)

  /** BPE-ish subword segmentation: letter runs, single digits, single
    * punctuation — the standard pre-tokenizer shape. */
  val BPE_PATTERN = "[a-z]+|[0-9]|[^a-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BPE_PATTERN), lit(0)))

  /** Stopword profiles for n-gram/stopword language ID. */
  val LANG_PROFILES: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on"),
    "es" -> Seq("el", "la", "de", "y", "en", "que", "los", "un"),
    "de" -> Seq("der", "die", "das", "und", "zu", "den", "von", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des", "en"))

  /** Per-language stopword hit ratio over whitespace tokens. */
  def langScore(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
    when(size(toks) > 0, hits.cast("double") / size(toks))
  }

  /** argmax language (ties resolved by profile order). */
  def langId(text: Column): Column = {
    val scores = LANG_PROFILES.map { case (l, sw) => (l, langScore(text, sw)) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(lit(null).cast("string")) { case (acc, (l, sc)) =>
      when(acc.isNull && sc === best, lit(l)).otherwise(acc)
    }
  }

  /** Quality metrics: length, token stats, stopword/repetition ratios. */
  def qualityMetrics(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    val n = size(toks)
    df.withColumn("n_chars_m", length(text))
      .withColumn("n_tokens", n)
      .withColumn("n_distinct_tokens", size(array_distinct(toks)))
      .withColumn("avg_token_len",
        when(n > 0, aggregate(transform(toks, t => length(t)), lit(0),
          (acc, x) => acc + x).cast("double") / n))
      .withColumn("stopword_ratio", langScore(text, LANG_PROFILES.head._2))
      .withColumn("repetition_ratio",
        when(n > 0, size(array_distinct(toks)).cast("double") / n))
  }

  /** Rabin-Karp rolling document fingerprint: polynomial hash of the
    * whole text mod 2^31-1. The modulus keeps the recurrence inside
    * 64-bit range without wrapping (acc < 2^31, so acc·31 + char <
    * 2^36) — the round-1 2^60 modulus silently overflowed Long on
    * acc·31 and was NOT the documented polynomial hash. */
  def fingerprint(text: Column): Column = {
    val M = 2147483647L // 2^31 - 1 (Mersenne prime)
    aggregate(split(text, ""), lit(0L),
      (acc, c) => pmod(acc * 31L + coalesce(ascii(c), lit(0)), lit(M)))
  }

  /** Min window-hash (winnowing-lite): min over 8-token windows of the
    * window's xxhash64 — a compact near-dup prefilter signature. */
  def minWindowHash(text: Column, window: Int = 8): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n >= window,
      array_min(transform(
        Dedup.zipNgrams(toks, window, (a, b) => concat(a, lit(" "), b)),
        w => xxhash64(w))))
      .otherwise(xxhash64(concat_ws(" ", toks)))
  }

  /** Polynomial twin of [[minWindowHash]] — the winnowing-lite
    * signature in exact cross-engine integer arithmetic (oracle query
    * d59 replays it; d11 keeps the xxhash64 throughput variant, the
    * same split as d02/d24 and d03/d53). Docs shorter than the window
    * fall back to the base-131 fold of their whole token-hash chain. */
  def minPolyWindowHash(text: Column, window: Int = 8): Column = {
    val hs = Dedup.polyTokenHashes(text)
    val P = graft.functions.PolyHashUtil.P
    when(size(hs) >= window,
      array_min(Dedup.polyWindowHashes(text, window)))
      .otherwise(aggregate(hs, lit(0L), (acc, h) => pmod(acc * 131L + h, lit(P))))
  }

  /** Global vocabulary: token → frequency, top-n (ties broken by
    * token). explode + one partial-agg shuffle on token, then top-n via
    * orderBy+limit — Spark plans that as TakeOrderedAndProject (each
    * partition keeps ≤ n rows, the driver merges), never a full sort of
    * the vocabulary. */
  def vocabulary(docs: DataFrame, text: Column, topN: Int): DataFrame =
    docs.select(explode(tokens(text)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(topN)

  /** Per-group quality filtering, window form: keep the best
    * `keepFrac` of each group (language, source, …) ranked by
    * repetition ratio (distinct/total tokens — boilerplate screams
    * low). percent_rank over (group, score desc, id): ties broken by
    * id so the kept set is deterministic.
    *
    * This is the SEMANTIC REFERENCE — exact kept fraction, id
    * tie-breaks — not the scale path: a window partitioned by language
    * sorts each language in one task, and a real web corpus is ~60%
    * one language, so the dominant group is a single-reducer wall at
    * 100 TB. Deploy `qualityFilterThreshold` below instead. */
  def qualityFilter(df: DataFrame, text: Column, group: Column,
                    id: Column, keepFrac: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group).orderBy(col("repetition_ratio").desc, id)
    qualityMetrics(df, text)
      .withColumn("q_rank", percent_rank().over(w))
      .filter(col("q_rank") <= keepFrac)
  }

  /** Per-group quality filtering, threshold form — the scale path:
    * compute each group's keep threshold (the (1−keepFrac) percentile
    * of the quality metric) in a TINY aggregate (rows = #groups),
    * broadcast it back, and filter at scan — the `lengthFilter` shape.
    * No window touches corpus-sized data, so a corpus that is 60% "en"
    * costs one map-side-combinable agg pass plus a map-only filter
    * instead of a single-task sort of the dominant language.
    *
    * The metric is the INTEGER-scaled repetition ratio
    * `distinct·10⁶ div total` — exact BIGINT in any engine (floor of
    * the double quotient is the true integer quotient while a doc
    * stays under ~10¹⁰ tokens; Spark's 2 GB row cap is hit long
    * before). The threshold rounds to 6 dp, and percentile interpolates
    * between INTEGERS, so the keep decision is engine-identical — the
    * same ulp argument `lengthFilter` documents. Ties AT the threshold
    * are all kept (the window form tie-breaks by id instead), so the
    * kept fraction can exceed keepFrac by the tie mass. Exact
    * `percentile` at gate SF; swap in `approx_percentile` at 100 TB —
    * d36 documents the sketch's rank-tolerance contract. */
  /** The integer-scaled repetition-ratio metric the threshold filter
    * cuts on: `distinct·10⁶ div total` tokens, exact BIGINT. */
  def repScaled(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    // split() never yields an empty array, but guard the division for
    // ANSI foreign sessions anyway
    when(n > 0,
      floor(size(array_distinct(toks)).cast("long") * lit(1000000L) / n))
      .otherwise(lit(0L)).cast("long")
  }

  /** Per-group keep thresholds for [[qualityFilterThreshold]] — one
    * tiny aggregate (rows = #groups): (grp, q_lo). Exposed separately
    * because the streaming path needs thresholds computed BATCH-side
    * (over the historical corpus) and applied to the stream map-only
    * ([[graft.streaming.EventStream.qualityFiltered]]). */
  /** Exact interpolated percentile or the GK-sketch approximation —
    * the documented 100 TB swap: `percentile` buffers every value per
    * group; `approx_percentile` holds a bounded sketch (rank error ≤
    * 1/accuracy, d36's tolerance contract) and merges map-side. Exact
    * is the oracle-gate default; approximate is what a real corpus
    * runs. */
  private def pctl(c: Column, p: Double, exact: Boolean): Column =
    if (exact) percentile(c, lit(p))
    else approx_percentile(c, lit(p), lit(10000)).cast("double")

  def qualityThresholds(df: DataFrame, text: Column, group: Column,
                        keepFrac: Double, exact: Boolean = true): DataFrame = {
    import graft.functions.Round.rd
    df.select(group.as("grp"), repScaled(text).as("_r"))
      .groupBy("grp")
      .agg(rd(pctl(col("_r"), 1 - keepFrac, exact), 6).as("q_lo"))
  }

  def qualityFilterThreshold(df: DataFrame, text: Column, group: Column,
                             id: Column, keepFrac: Double,
                             exact: Boolean = true): DataFrame = {
    val scored = df.select(id.as("doc_id"), group.as("grp"),
      repScaled(text).as("rep_scaled"))
    scored.join(broadcast(
        qualityThresholds(df, text, group, keepFrac, exact)), "grp")
      .filter(col("rep_scaled") >= col("q_lo"))
      .select("doc_id", "grp", "rep_scaled")
  }

  /** Token-budget sequence packing: within each stream, docs in id
    * order are chunked wherever the running token total crosses the
    * budget — `pack_id = floor(exclusive_prefix_sum / budget)`. The
    * fixed-boundary rule (vs greedy first-fit) is one window cumsum
    * and parallelizes by stream; true first-fit packing is inherently
    * sequential and would serialize 100 TB behind one cursor. */
  def packBudget(df: DataFrame, stream: Column, id: Column,
                 nTokens: Column, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stream).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("pack_id",
      floor(coalesce(sum(nTokens).over(w), lit(0L)) / budget))
  }

  /** [[packBudget]] with the per-stream window decomposed into a
    * two-phase distributed prefix sum — IDENTICAL assignments
    * (spec-pinned, including ties and empty slices), but no one-task-
    * per-stream wall: `packBudget`'s window puts each stream's ENTIRE
    * row set through one task, so a corpus where 90% of docs share one
    * stream serializes behind a single sorter at 100 TB. Each stream's
    * id axis splits into `slices` DETERMINISTIC contiguous ranges
    * (per-stream min/max id bounds, broadcast; slice = the
    * proportional position of the id in its stream's range — monotone
    * in id, so slice order IS id order): phase 1 aggregates one token
    * total per (stream, slice) (a ≤`slices`-row-per-stream table whose
    * per-stream cumulative window is KB-sized), phase 2 adds the
    * broadcast offset to each slice's LOCAL prefix sum, whose window
    * is bounded by the slice, never the stream.
    *
    * The slice expression is deliberately a PURE FUNCTION of
    * (stream, id) rather than `spark_partition_id` over a range
    * shuffle: the physical partition id is only consistent between
    * phase 1 and phase 2 if the optimizer reuses the exchange, and a
    * reuse miss (pruned columns, `exchange.reuse=false`, AQE
    * re-planning) would silently mis-join offsets. A deterministic
    * slice is identical however many times the plan recomputes it.
    * The trade: slice balance now follows the id distribution (dense
    * ids → even slices; adversarially clustered ids degrade balance,
    * never correctness). */
  def packBudgetScalable(df: DataFrame, stream: Column, id: Column,
                         nTokens: Column, budget: Long,
                         slices: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val staged0 = df.withColumn("_stream", stream).withColumn("_id", id)
      .withColumn("_nt", nTokens.cast("long"))
    val bounds = staged0.groupBy(col("_stream"))
      .agg(min(col("_id")).as("_lo"), max(col("_id")).as("_hi"))
    // proportional position of _id in [_lo, _hi] → slice 0..slices-1.
    // ALL-double arithmetic: long→double and x−c, x·c are monotone
    // non-decreasing in IEEE, so the slice mapping is monotone in _id
    // for the entire long range (a long-typed _id − _lo could overflow
    // on extreme spans and break contiguity), which is all
    // correctness needs
    // null-SAFE stream joins throughout: packBudget's window keeps a
    // NULL stream as its own partition, so the two-phase twin must
    // too — a plain equi join would silently drop every NULL-stream
    // row and break the IDENTICAL-assignments contract
    val staged = staged0.as("d")
      .join(broadcast(bounds.as("bo")),
        col("d._stream") <=> col("bo._stream"))
      .select(col("d.*"), col("bo._lo"), col("bo._hi"))
      .withColumn("_pid", least(lit(slices - 1), greatest(lit(0), floor(
        (col("_id").cast("double") - col("_lo").cast("double")) * slices /
          (col("_hi").cast("double") - col("_lo").cast("double") + 1))
        .cast("int"))))
      .drop("_lo", "_hi")
    val wOff = Window.partitionBy(col("_stream")).orderBy(col("_pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = staged.groupBy(col("_stream"), col("_pid"))
      .agg(sum(col("_nt")).as("_slice_tokens"))
      .withColumn("_offset", coalesce(sum(col("_slice_tokens")).over(wOff), lit(0L)))
      .select(col("_stream"), col("_pid"), col("_offset"))
    val wLoc = Window.partitionBy(col("_stream"), col("_pid")).orderBy(col("_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    staged.as("x").join(broadcast(offsets.as("o")),
        col("x._stream") <=> col("o._stream") && col("x._pid") === col("o._pid"))
      .select(col("x.*"), col("o._offset"))
      .withColumn("pack_id", floor(
        (col("_offset") + coalesce(sum(col("_nt")).over(wLoc), lit(0L))) / budget))
      .drop("_stream", "_id", "_nt", "_pid", "_offset")
  }

  /** Training-example assembly — the pipeline's last mile after
    * packing: the per-doc MANIFEST a training loader consumes, with
    * each doc's token offset range inside its pack plus the pack's
    * totals (doc count, token count, scaled fill ratio vs budget).
    * Builds on [[packBudgetScalable]] (no one-task-per-stream wall);
    * offsets and totals come from windows partitioned by (stream,
    * pack_id) — a pack holds < budget + max_doc tokens by
    * construction, so these partitions are BOUNDED regardless of
    * corpus size (never a corpus- or stream-sized sort). Fill ratio is
    * scaled-integer (10⁶·tokens div budget): engine-exact, and packs
    * under ~90% fill are the loader's padding-waste signal. */
  def packManifest(df: DataFrame, stream: Column, id: Column,
                   nTokens: Column, budget: Long,
                   slices: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val packed = packBudgetScalable(
      df.select(stream.as("stream"), id.as("doc_id"),
        nTokens.cast("long").as("n_tokens")),
      col("stream"), col("doc_id"), col("n_tokens"), budget, slices)
    val part = Window.partitionBy(col("stream"), col("pack_id"))
    val before = part.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    packed
      .withColumn("off_start", coalesce(sum(col("n_tokens")).over(before), lit(0L)))
      .withColumn("off_end", col("off_start") + col("n_tokens"))
      .withColumn("pack_tokens", sum(col("n_tokens")).over(part))
      .withColumn("n_docs", count(lit(1)).over(part))
      .withColumn("fill_ppm",
        expr(s"(pack_tokens * 1000000L) div ${budget}L"))
  }

  /** Benchmark decontamination: count, per corpus document, the
    * distinct n-grams it shares with a benchmark snippet set — the
    * standard "did an eval question leak into the training set" check.
    * The benchmark side is n-grammed, deduped, and BROADCAST (eval
    * suites are tiny next to a 100 TB corpus); the corpus side is a
    * map-only n-gram explode, so the whole check is one broadcast-join
    * pass at scan speed — no shuffle of corpus data at all. Docs with
    * zero overlap produce no row. `shingles()` dedupes n-grams within a
    * doc, so count(*) after the join IS the distinct-overlap count. */
  def contaminationCounts(corpus: DataFrame, bench: DataFrame,
                          text: Column, id: Column, benchText: Column,
                          n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(Dedup.shingles(benchText, n)).as("ngram")).distinct()
    corpus.filter(size(tokens(text)) >= n)
      .select(id.as("doc_id"), explode(Dedup.shingles(text, n)).as("ngram"))
      .join(broadcast(benchGrams), "ngram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-suite contamination REPORT — the audit a decontamination run
    * publishes per benchmark ("how much of suite X leaked into the
    * corpus"): contaminated-doc counts, total and max shared n-grams,
    * per suite. All suites' grams carry their suite tag into ONE
    * broadcast join, so the corpus is shingled and scanned ONCE no
    * matter how many benchmarks are audited (per-suite
    * [[contaminationCounts]] calls would pay one corpus pass each).
    * Output is suite-sized — rows, not corpus data. */
  def contaminationReport(corpus: DataFrame, benches: DataFrame,
                          text: Column, id: Column,
                          n: Int = 8): DataFrame = {
    val grams = benches.select(col("suite"),
      explode(Dedup.shingles(col("snippet"), n)).as("ngram")).distinct()
    corpus.filter(size(tokens(text)) >= n)
      .select(id.as("doc_id"), explode(Dedup.shingles(text, n)).as("ngram"))
      .join(broadcast(grams), "ngram")
      .groupBy(col("suite"), col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .groupBy(col("suite"))
      .agg(count(lit(1)).as("n_contaminated_docs"),
        sum(col("n_shared")).as("total_shared"),
        max(col("n_shared")).as("max_shared"))
  }

  /** Corpus-frequency quality score: average corpus frequency of the
    * document's tokens (rare-token-heavy docs — codes, gibberish,
    * boilerplate IDs — score low; a distribution-based cousin of
    * perplexity filtering that needs no language model). Two passes:
    * token counts (one agg shuffle), then a token→count join back and
    * a per-doc agg. The vocabulary is Zipf-bounded, tiny next to the
    * corpus, so the join side is broadcast; the per-doc sum is INTEGER
    * (order-independent — a float sum here would be nondeterministic
    * under shuffle) with one final rounded division. */
  def tokenFrequencyScore(docs: DataFrame, text: Column, id: Column): DataFrame = {
    import graft.functions.Round.rd
    val x = docs.select(id.as("doc_id"), explode(tokens(text)).as("token"))
    val vocab = x.groupBy("token").agg(count(lit(1)).as("cnt"))
    x.join(broadcast(vocab), "token")
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("total_freq"),
        count(lit(1)).cast("long").as("n_tokens"))
      .select(col("doc_id"), col("total_freq"), col("n_tokens"),
        rd(col("total_freq").cast("double") / col("n_tokens"), 6).as("freq_score"))
  }

  /** Gopher-style n-gram repetition: per doc, the count of its most
    * frequent n-gram and the fraction of all n-gram slots it occupies —
    * boilerplate/SEO-spam screams high. Non-distinct n-grams (unlike
    * `Dedup.shingles`) because multiplicity IS the signal. Shape:
    * explode → (doc, gram) count → per-doc max/sum — two partial-agg
    * shuffles keyed by doc-sized groups, no skew wall (a doc's grams
    * are bounded by its length). */
  def ngramRepetition(docs: DataFrame, text: Column, id: Column,
                      n: Int): DataFrame = {
    val toks = tokens(text)
    val grams = docs.filter(size(toks) >= n)
      .select(id.as("doc_id"),
        explode(Dedup.zipNgrams(toks, n,
          (a, b) => concat(a, lit(" "), b))).as("g"))
    grams.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as(s"top$n"), sum(col("c")).as(s"n$n"))
  }

  /** C4-style line-level cleanup: drop boilerplate/navigation lines,
    * keep the document if anything survives. The classic C4 rules are
    * "≥ 3 words, ends in terminal punctuation, no policy tokens"; the
    * rule set here is parameterized the same way — a minimum token
    * count, a required-token set (the naturalness proxy; C4 uses the
    * terminal-punctuation test), and a banned-token set (C4 drops
    * lines mentioning javascript/cookies/lorem ipsum). Map-only array
    * expressions — line filtering costs one codegen'd scan at any
    * corpus size, no shuffle. Returns per doc: total/kept line counts
    * and the reassembled cleaned text. */
  def cleanLines(df: DataFrame, text: Column, minTokens: Int,
                 mustContain: Seq[String], banned: Seq[String]): DataFrame = {
    val lines = split(text, "\n")
    def lineToks(l: Column) = split(lower(l), "\\s+")
    val keep = (l: Column) =>
      (size(lineToks(l)) >= minTokens) &&
        exists(lineToks(l), t => t.isin(mustContain.map(lit): _*)) &&
        !exists(lineToks(l), t => t.isin(banned.map(lit): _*))
    df.withColumn("n_lines", size(lines).cast("long"))
      .withColumn("_kept", filter(lines, keep))
      .withColumn("n_kept", size(col("_kept")).cast("long"))
      .withColumn("clean_text", concat_ws("\n", col("_kept")))
      .drop("_kept")
  }

  /** GLOBAL line-level dedup — C4's "discard all but one of any
    * three-sentence span occurring more than once" applied at line
    * granularity corpus-wide: the first occurrence (lowest (doc, idx))
    * of every distinct line survives; repeats are dropped everywhere
    * else, and each doc is reassembled from its surviving lines in
    * original order.
    *
    * Scale shape: the first-occurrence rule is `min(struct(page_id,
    * line_idx))` per distinct line — a map-side-combinable aggregate,
    * NOT a window. A boilerplate line repeated 10⁹ times corpus-wide
    * pre-aggregates to one candidate per mapper before the shuffle, so
    * the hot key arrives at its reducer a few-thousand rows tall (one
    * per map task), where `row_number() over (partition by line)`
    * would sort all 10⁹ occurrences in ONE task. The winners then
    * regroup by page into a keep-index list (tiny: ≤ one row per
    * distinct line) and join back to the ORIGINAL pages on page_id —
    * a skew-free unique key — so no corpus-sized shuffle is ever keyed
    * by line content after the partial agg. Three hash exchanges
    * total: exploded lines → line agg; winners → page_id regroup
    * (winner rows only); pages → the page_id join (reusing the
    * regroup's partitioning on the other side). No corpus self-join;
    * no WindowExec anywhere. Returns per doc: total lines, kept
    * lines, reassembled text ('' when everything was a repeat —
    * callers drop those). */
  def dedupLinesGlobal(pages: DataFrame, pageId: Column, text: Column): DataFrame = {
    val lines = pages.select(pageId.as("page_id"),
      posexplode(split(text, "\n")).as(Seq("line_idx", "line")))
    // struct min orders by (page_id, line_idx) — the corpus-wide
    // first occurrence, ties impossible (position pairs are unique)
    val keepIdx = lines
      .groupBy(col("line"))
      .agg(min(struct(col("page_id"), col("line_idx"))).as("w"))
      .groupBy(col("w.page_id").as("page_id"))
      .agg(sort_array(collect_list(col("w.line_idx"))).as("_keep"))
    pages.select(pageId.as("page_id"), split(text, "\n").as("_lines"))
      .join(keepIdx, Seq("page_id"), "left")
      .select(col("page_id"),
        size(col("_lines")).cast("long").as("n_lines"),
        coalesce(size(col("_keep")), lit(0)).cast("long").as("n_kept"),
        // _keep is sorted ascending = original order; element_at is
        // 1-based while posexplode's line_idx is 0-based. A page with
        // zero winners has _keep null → transform null → concat_ws
        // skips it → '' (same as the pre-r5 window form).
        concat_ws("\n", transform(col("_keep"),
          i => element_at(col("_lines"), i + 1))).as("clean_text"))
  }

  /** Per-doc top-k salient terms by tf/df — tf-idf with a linear
    * inverse-document-frequency weight (same ranking as tf·(N/df);
    * a single integer division keeps the score bit-identical across
    * engines, where ln(N/df) would hash-mismatch in the last ulp).
    * Shape: one (doc, token) count agg, a token→df agg joined back
    * BROADCAST (the vocabulary is Zipf-bounded, tiny next to the
    * corpus), then a per-doc window top-k — the window key is doc_id,
    * so no single-reducer wall. */
  def tfidfTopTerms(docs: DataFrame, text: Column, id: Column,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Round.rd
    val tf = docs.select(id.as("doc_id"), explode(tokens(text)).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    tf.join(broadcast(dfreq), "token")
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"),
        rd(col("score"), 6).as("score"))
  }

  /** DSIR-style importance weighting (Xie et al., "Data Selection for
    * Language Models via Importance Resampling"): score each corpus
    * document by how much its hashed-bigram feature distribution looks
    * like a TARGET seed set (wiki-quality text) versus the raw corpus.
    * Features are polynomial bigram hashes folded into `buckets`
    * buckets (the paper's hashed n-gram features); each bucket's weight
    * is `floor((target_cnt+1)·10⁶ / (raw_cnt+1))` — add-one-smoothed
    * linear ratio instead of the paper's log-ratio, the same
    * exact-cross-engine trade as [[tfidfTopTerms]]' linear idf (both
    * engines do ONE double multiply + divide + floor; ln() differs in
    * the last ulp). A doc's weight is the integer SUM of its feature
    * weights (order-independent under shuffle, where a float sum is
    * not), plus the rounded average ratio for thresholding.
    *
    * Scale shape: both count tables are bounded by `buckets` rows (KB)
    * no matter the corpus size, so the score join BROADCASTS; the
    * corpus pays one map-only bigram explode and one per-doc agg
    * shuffle. The target seed is typically tiny and re-scanned once.
    * Docs with < 2 tokens have no features and produce no row. */
  def importanceWeights(corpus: DataFrame, target: DataFrame,
                        text: Column, id: Column,
                        buckets: Int = 4096): DataFrame = {
    def counted(df: DataFrame, as: String): DataFrame =
      df.filter(size(tokens(text)) >= 2)
        .select(explode(bigramFeats(text, buckets)).as("f"))
        .groupBy("f").agg(count(lit(1)).as(as))
    val scores = counted(corpus, "raw_cnt")
      .join(counted(target, "tgt_cnt"), Seq("f"), "left")
      .select(col("f"), featScore(
        coalesce(col("tgt_cnt"), lit(0L)), col("raw_cnt")))
    weightRollup(corpus, text, id, buckets, scores)
  }

  /** [[importanceWeights]] for the common case where the target is a
    * SLICE of the corpus (lang = 'en', source = 'wiki' — the standard
    * DSIR setup): one conditional aggregate computes the target and
    * raw bucket counts in the SAME feature pass, saving a full corpus
    * scan versus the two-DataFrame form. Identical output (spec-pinned
    * and oracle-shared). */
  def importanceWeightsBy(corpus: DataFrame, isTarget: Column,
                          text: Column, id: Column,
                          buckets: Int = 4096): DataFrame = {
    val scores = corpus.filter(size(tokens(text)) >= 2)
      .select(isTarget.as("_t"), explode(bigramFeats(text, buckets)).as("f"))
      .groupBy("f").agg(count(lit(1)).as("raw_cnt"),
        sum(when(col("_t"), 1L).otherwise(0L)).as("tgt_cnt"))
      .select(col("f"), featScore(col("tgt_cnt"), col("raw_cnt")))
    weightRollup(corpus, text, id, buckets, scores)
  }

  /** CCNet-style n-gram language-model quality scoring: score every
    * corpus document by its average smoothed bigram likelihood under a
    * model trained on a trusted `target` slice (CCNet trains KenLM on
    * Wikipedia and buckets CommonCrawl by perplexity; this is the same
    * signal with an add-one-smoothed bigram model). Differs from
    * [[importanceWeights]] in kind: CONDITIONAL P(w₂|w₁) estimates
    * against real (unhashed) bigrams with vocabulary smoothing, not an
    * unconditioned hashed-bucket frequency ratio — low scores flag
    * token-order gibberish that bag-of-features ratios miss.
    *
    * Per doc-bigram: `⌊(c(w₁w₂)+1)·10⁶ / (c(w₁)+V)⌋` (counts from the
    * target; V = target vocabulary) — one fixed-shape double divide
    * floored to a long, so the per-doc SUM is order-independent and
    * hashes identically in any engine (ln-perplexity would differ in
    * the last ulp; the ranking is monotone-equivalent per bigram).
    *
    * Scale shape: the model is vocabulary-bounded, not corpus-bounded —
    * both count tables live on the target slice (tiny by construction)
    * and BROADCAST; the corpus pays one map-only bigram explode and one
    * per-doc partial-agg shuffle. Docs with < 2 tokens have no bigrams
    * and produce no row. */
  def bigramLmScore(corpus: DataFrame, target: DataFrame,
                    text: Column, id: Column): DataFrame = {
    val toks = tokens(text)
    val tgUni = target.select(explode(tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val vocab = tgUni.agg(count(lit(1)).as("v"))
    val tgBi = target.filter(size(tokens(text)) >= 2)
      .select(explode(Dedup.zipNgrams(tokens(text), 2,
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
    val docBi = corpus.filter(size(toks) >= 2)
      .select(id.as("doc_id"),
        explode(Dedup.zipNgrams(toks, 2,
          (a, b) => struct(a.as("w1"), concat(a, lit(" "), b).as("bg")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.bg").as("bg"))
    docBi
      .join(broadcast(tgBi), Seq("bg"), "left")
      .join(broadcast(tgUni), col("w1") === col("w"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("s", floor((coalesce(col("c12"), lit(0L)) + lit(1L))
        * lit(1000000.0) / (coalesce(col("c1"), lit(0L)) + col("v")))
        .cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("s")).as("lm_sum"), count(lit(1)).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("lm_sum"),
        floor(col("lm_sum").cast("double") / col("n_bigrams"))
          .cast("long").as("lm_score"))
  }

  /** [[bigramLmScore]]'s model, materialized as driver-side maps for
    * the MAP-ONLY scoring path (streaming, or a broadcast-variable
    * deployment): per-bigram scores, per-context fallbacks (seen w₁,
    * unseen bigram), and the unseen-context default. The driver
    * collect is CAPPED at `maxEntries` per table (top entries by
    * count, ties by key — a deterministic slice): at 100 TB Heaps'
    * law puts distinct bigrams at 10⁹⁺, so an uncapped collect is
    * corpus-scale, not vocabulary-scale. V (the smoothing constant)
    * is always the FULL distinct-unigram count (a scalar aggregate),
    * and per-bigram scores are computed IN-PLAN before the slice, so
    * every entry that survives the cap scores identically to the
    * join path ([[bigramLmScore]]); entries cut by the cap fall back
    * to the seen-w₁/unseen-default smoothing rule. When the true
    * vocabulary fits under the cap — the gate corpus, spec-pinned —
    * capped == full and the two paths agree exactly. */
  def bigramLmModel(target: DataFrame, text: Column,
                    maxEntries: Int = 1 << 20):
      (Map[String, Long], Map[String, Long], Long) = {
    val tgUni = target.select(explode(tokens(text)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val v = tgUni.count().max(1L)
    def score(c12: Long, c1: Long): Long =
      math.floor((c12 + 1L) * 1000000.0 / (c1 + v)).toLong
    val uniTop = tgUni
      .orderBy(col("c1").desc, col("w"))
      .limit(maxEntries)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val bi = target.filter(size(tokens(text)) >= 2)
      .select(explode(Dedup.zipNgrams(tokens(text), 2,
        (a, b) => concat(a, lit(" "), b))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c12"))
    // score in-plan (bigram joined to its w₁ context count — a
    // distributed shuffle join, never a driver map lookup), THEN the
    // deterministic top-M slice, THEN the bounded collect
    val bgScore = bi
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(tgUni, col("w1") === col("w"))
      .withColumn("s", floor((col("c12") + lit(1L)) * lit(1000000.0)
        / (col("c1") + lit(v.toDouble))).cast("long"))
      .orderBy(col("c12").desc, col("bg"))
      .limit(maxEntries)
      .select(col("bg"), col("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w1Score = uniTop.map { case (w, c1) => w -> score(0L, c1) }.toMap
    (bgScore, w1Score, score(0L, 0L))
  }

  /** Hashed-bigram feature buckets (polynomial bigram hash mod
    * `buckets`) — the DSIR feature space. Zip-sliced so the token-hash
    * array is computed O(1) times per row, not per bigram (see
    * [[Dedup.zipNgrams]]). */
  private def bigramFeats(text: Column, buckets: Int): Column = {
    val P = graft.functions.PolyHashUtil.P
    val hs = Dedup.polyTokenHashes(text)
    transform(Dedup.zipNgrams(hs, 2, (a, b) => pmod(a * 131L + b, lit(P))),
      h => pmod(h, lit(buckets.toLong)))
  }

  /** Add-one-smoothed linear target/raw ratio, scaled ×10⁶ and floored
    * (one double multiply + divide — same IEEE result both engines). */
  private def featScore(tgt: Column, raw: Column): Column =
    floor((tgt + 1L).cast("double") * 1000000d / (raw + 1L)).as("f_score")

  /** Per-doc rollup shared by both weighting forms: integer score sum
    * (shuffle-order independent) + rounded average ratio. */
  private def weightRollup(corpus: DataFrame, text: Column, id: Column,
                           buckets: Int, scores: DataFrame): DataFrame =
    corpus.filter(size(tokens(text)) >= 2)
      .select(id.as("doc_id"), explode(bigramFeats(text, buckets)).as("f"))
      .join(broadcast(scores), "f")
      .groupBy("doc_id")
      .agg(sum("f_score").as("weight"), count(lit(1)).as("n_feats"))
      .select(col("doc_id"), col("weight"), col("n_feats"),
        graft.functions.Round.rd(
          col("weight").cast("double") / col("n_feats") / 1000000d, 6)
          .as("avg_ratio"))

  /** Token-balanced training-shard assignment: a deterministic global
    * hash shuffle (order by [[Sampling.bucket]], then id) + an
    * EXCLUSIVE global token prefix-sum → `shard_id = floor(start_pos /
    * shardTokens)` — the "write the curated corpus as N equal-token
    * shards in random order" step at the end of every data pipeline.
    *
    * The prefix sum is computed DISTRIBUTED, never as one global
    * window (`Window.orderBy` with no partitionBy is a one-task wall —
    * the round-1 deidentify lesson): rows are range-grouped into
    * `groups` contiguous slices of the hash order, per-slice totals (a
    * `groups`-row aggregate) are cumsummed on the driver-sized side and
    * broadcast back as offsets, and each slice runs only its LOCAL
    * window. Because `slice = floor(bucket·groups / 10⁶)` is monotone
    * in the hash order, offset + local prefix == the global prefix sum,
    * row for row. */
  def assignShards(docs: DataFrame, id: Column, nTokens: Column,
                   shardTokens: Long, groups: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = 1000000L
    val base = docs.select(id.as("doc_id"), nTokens.cast("long").as("n_tokens"),
        Sampling.bucket(id).as("_b"))
      // b·groups < 10⁶·groups — exact in double, so floor is the true
      // integer quotient
      .withColumn("_g", floor(col("_b") * groups / lit(B.toDouble)))
    val wg = Window.orderBy("_g").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("_g").agg(sum("n_tokens").as("_slice_tokens"))
      // ≤ `groups` rows: the unpartitioned window here runs over a
      // KB-sized aggregate, not the corpus
      .withColumn("_offset", coalesce(sum("_slice_tokens").over(wg), lit(0L)))
      .select("_g", "_offset")
    val wl = Window.partitionBy("_g").orderBy(col("_b"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), "_g")
      .withColumn("start_pos",
        col("_offset") + coalesce(sum("n_tokens").over(wl), lit(0L)))
      .withColumn("shard_id", floor(col("start_pos") / shardTokens))
      .select(col("doc_id"), col("n_tokens"), col("start_pos"), col("shard_id"))
  }

  /** Data-derived length filtering — the Gopher/C4 outlier-length rule
    * with per-group percentile cutoffs instead of magic constants:
    * keep docs whose token count lies within the group's [lo, hi]
    * exact interpolated percentiles. Two passes: a tiny per-group
    * threshold aggregate (rows = #groups) broadcast back, then a
    * map-only filter. Thresholds round to 6 dp before comparing so
    * the keep decision is engine-identical (raw interpolation can
    * differ in the last ulp; token counts are integers, so a rounded
    * threshold never sits within an ulp of a count). `exact = false`
    * is the 100 TB swap: `approx_percentile`'s bounded GK sketch
    * (rank error ≤ 1/accuracy, spec-pinned) instead of buffering
    * every value per group. */
  def lengthFilter(docs: DataFrame, text: Column, group: Column, id: Column,
                   lo: Double = 0.05, hi: Double = 0.95,
                   exact: Boolean = true): DataFrame = {
    import graft.functions.Round.rd
    val n = size(tokens(text)).cast("long")
    val th = docs.select(group.as("grp"), n.as("_n"))
      .groupBy("grp")
      .agg(rd(pctl(col("_n"), lo, exact), 6).as("p_lo"),
        rd(pctl(col("_n"), hi, exact), 6).as("p_hi"))
    docs.select(id.as("doc_id"), group.as("grp"), n.as("n_tokens"))
      .join(broadcast(th), "grp")
      .filter(col("n_tokens") >= col("p_lo") && col("n_tokens") <= col("p_hi"))
      .select("doc_id", "grp", "n_tokens")
  }

  /** Curriculum difficulty binning — the data-ladder ASSIGNMENT step
    * (d51's threshold machinery pointed at binning instead of
    * filtering): per group, the metric's (1/n .. (n−1)/n) percentile
    * boundaries are computed in a TINY aggregate (#groups rows),
    * broadcast, and every doc is tagged map-only with
    * bin = #boundaries strictly below its metric (0 = easiest). Equal
    * metric values always share a bin, so the binning is deterministic
    * and repartition-invariant; bins are nested in refinement (the
    * quartile cut points are a subset of the octile ones). No window
    * ever touches corpus-sized data — the same reason d18/d51 moved
    * off percent_rank; exact percentile at gate SF,
    * `exact = false` swaps in approx_percentile's mergeable sketch for
    * the 100 TB run. */
  def difficultyBins(docs: DataFrame, metric: Column, group: Column,
                     id: Column, nBins: Int = 4,
                     exact: Boolean = true): DataFrame = {
    import graft.functions.Round.rd
    require(nBins >= 2 && nBins <= 100,
      s"nBins must be in [2,100], got $nBins")
    val m = metric.cast("double")
    val bounds = (1 until nBins).map(i =>
      rd(pctl(col("_m"), i.toDouble / nBins, exact), 6).as(s"_b$i"))
    val th = docs.select(group.as("grp"), m.as("_m"))
      .groupBy("grp").agg(bounds.head, bounds.tail: _*)
    val binCol = (1 until nBins).map(i =>
      when(col("_mv") > col(s"_b$i"), 1L).otherwise(0L)).reduce(_ + _)
    docs.select(id.as("doc_id"), group.as("grp"), m.as("_mv"))
      .join(broadcast(th), "grp")
      .select(col("doc_id"), col("grp"), col("_mv").as("metric"),
        binCol.as("bin"))
  }

  /** Canonical text normalization — the first stage of every curation
    * pipeline: lowercase, control characters → space, whitespace runs
    * collapsed, ends trimmed. Regex subset chosen to mean the same
    * thing in Java regex and RE2 (explicit `[\x00-\x1f\x7f]`, not
    * `\p{Cntrl}`). Map-only, codegen'd — scan speed at any size. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[\\x00-\\x1f\\x7f]", " "), "\\s+", " "))

  /** Corpus report card: per group (source, language, shard …) — doc
    * and token counts, exact-duplicate fraction, aggregate type-token
    * ratio. ONE hash-aggregate pass (countDistinct adds Spark's
    * standard two-phase expand); all sums are integers so the result
    * is order-independent under shuffle, with two final rounded
    * divisions. The per-group cardinality is what a 100 TB curation
    * run prints after every stage. */
  def corpusReport(docs: DataFrame, text: Column, group: Column): DataFrame = {
    import graft.functions.Round.rd
    val toks = tokens(text)
    docs.groupBy(group.as("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(toks)).as("n_tokens"),
        countDistinct(md5(text)).as("n_unique"),
        sum(size(array_distinct(toks))).as("n_distinct_tokens"))
      .select(col("grp"), col("n_docs"), col("n_tokens"), col("n_unique"),
        rd(lit(1d) - col("n_unique").cast("double") / col("n_docs"), 6)
          .as("dup_frac"),
        rd(col("n_distinct_tokens").cast("double") / col("n_tokens"), 6)
          .as("ttr"))
  }

  /** Sliding token-window chunking with stride — the context-window
    * step of RAG indexing and long-doc pretraining: each doc yields
    * chunks of `win` tokens starting every `stride` tokens (overlap =
    * win − stride), the last chunk keeping whatever tail remains. A doc
    * with ≤ win tokens yields exactly one chunk. Chunk count is
    * `1 + max(0, ceil((n − win)/stride))` in pure integer arithmetic,
    * so the decomposition is engine-exact. Map-only: one transform +
    * posexplode at scan speed — no shuffle, no state, any corpus size.
    * Returns (doc_id, chunk_idx, n_tokens, chunk_hash); callers wanting
    * the chunk text swap the md5 for the concat itself. */
  def chunkTokens(docs: DataFrame, text: Column, id: Column,
                  win: Int, stride: Int): DataFrame = {
    require(win > 0 && stride > 0, "win and stride must be positive")
    val toks = tokens(text)
    val n = size(toks).cast("long")
    // ceil((n - win)/stride) via (n - win + stride - 1) div stride;
    // values are doc-token counts — far below 2^52, so the double
    // floor is the true integer quotient
    val extra = greatest(lit(0L),
      floor((n - win + (stride - 1)).cast("double") / stride).cast("long"))
    docs.select(id.as("doc_id"), toks.as("_t"), extra.as("_x"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), col("_x")),
          i => slice(col("_t"), (i * stride + 1).cast("int"), lit(win)))).as(Seq("chunk_idx", "_c")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("_c")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("_c"))).as("chunk_hash"))
  }

  /** fastText-style hashed linear quality classifier — the CCNet /
    * RefinedWeb "model-based quality filter": token features are
    * HASHED into a fixed `buckets`-slot space (the hashing trick), so
    * the model is bounded at `buckets` rows regardless of corpus
    * vocabulary — broadcast-safe at ANY scale, where a
    * vocabulary-keyed model grows Heaps-law-unbounded (~10⁹ rows at
    * 100 TB, the un-broadcastable shape the BM25 df fix removed).
    * Labels come from `labelExpr`, a cheap heuristic gate evaluated on
    * the same rows (bootstrap labeling — the CCNet move of training
    * against a reference-vs-crawl split, here any integer rule);
    * weights are add-one-smoothed class-conditional frequencies in
    * pure integer arithmetic:
    *   w_f = ⌊10⁶·(pos_f + 1) / (pos_f + neg_f + 2)⌋
    * and a doc's score is the integer mean of its DISTINCT features'
    * weights (distinct = Bernoulli features, so a token repeated 100×
    * votes once), is_good = score > 500000. Every step — poly token
    * hash, bucket mod, floor divisions, long sums — is exact 64-bit
    * integer arithmetic: bit-identical across engines, runs, and
    * partitionings.
    *
    * Scale shape: training is one explode + partial-agg shuffle keyed
    * by feature — at most `buckets` keys, uniformized BY the hashing,
    * map-side combined; scoring is a map-only explode + BROADCAST
    * model join + per-doc partial agg. The corpus itself never
    * shuffles. At 100 TB train on a [[graft.operators.Sampling]]
    * sample instead of the full corpus — the score path is unchanged. */
  private def intDivL(a: Column, b: Column): Column =
    graft.functions.IntMath.intDiv(a, b)

  /** The distinct hashed feature ids of a doc — shared by the batch
    * train/score paths and the streaming twin so the three can never
    * hash differently. */
  def classifierFeatures(text: Column, buckets: Int = 65536): Column = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    array_distinct(transform(Dedup.polyTokenHashes(text),
      h => pmod(h, lit(buckets.toLong))))
  }

  /** The trained model: (f, _w) — at most `buckets` rows. A feature
    * absent from the model scores the smoothing prior
    * ⌊10⁶·1/2⌋ = 500000 (the (0+1)/(0+2) add-one case), which is what
    * [[graft.streaming.EventStream.classifierScored]] substitutes for
    * unseen features at ingest. */
  def classifierModel(docs: DataFrame, text: Column, labelExpr: Column,
                      buckets: Int = 65536): DataFrame =
    docs.select(labelExpr.as("_pos"),
        explode(classifierFeatures(text, buckets)).as("f"))
      .groupBy("f")
      .agg(sum(when(col("_pos"), 1L).otherwise(0L)).as("_np"),
        count(lit(1)).as("_nt"))
      .select(col("f"),
        intDivL(lit(1000000L) * (col("_np") + 1L), col("_nt") + 2L).as("_w"))

  def classifierQuality(docs: DataFrame, text: Column, id: Column,
                        labelExpr: Column, buckets: Int = 65536): DataFrame = {
    val base = docs.select(id.as("doc_id"),
      classifierFeatures(text, buckets).as("_f"))
    val model = classifierModel(docs, text, labelExpr, buckets)
    base.select(col("doc_id"), explode(col("_f")).as("f"))
      .join(broadcast(model), "f")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("_w")).as("_ws"))
      .select(col("doc_id"), col("n_feats"),
        intDivL(col("_ws"), col("n_feats")).as("clf_score"),
        (intDivL(col("_ws"), col("n_feats")) > 500000L).as("is_good"))
  }

  /** Compression-ratio quality signal — the Gopher-class redundancy
    * score: `deflate_len(text) / octet_length(text)`, scaled-rounded
    * to 6 dp. Boilerplate, templates, and long-range repeats compress
    * far below natural prose, catching redundancy the n-gram
    * heuristics (d28) miss. Map-only native expression
    * ([[graft.functions.DeflateLenExpr]] — inside whole-stage
    * codegen, thread-local Deflater); NULL for empty text. zlib output
    * is engine-specific, so the gate hashes the d75 in-plan verdict
    * and the per-doc surface is spec-pinned, not oracle-replayed. */
  def compressionRatio(text: Column): Column = {
    import graft.functions.Round.rd
    val raw = octet_length(text)
    when(raw > 0,
      rd(graft.functions.DeflateLenExpr.column(text).cast("double") / raw, 6))
  }

  /** Tokenizer merge-candidate statistics — the inner loop of BPE /
    * WordPiece training, distributed: count every ADJACENT token pair
    * in the corpus and return the top `topN` merge candidates (count
    * desc, pair asc — deterministic ties). One training round of a
    * real tokenizer = take the top pair, merge it corpus-wide, and
    * recount; this operator is that recount as ONE Spark job, the
    * step that does not fit a single machine at 100 TB (the merge
    * itself is a map-only regexp/array rewrite between rounds).
    *
    * Scale shape: explode is O(corpus tokens) map-only; one
    * partial-agg shuffle keyed by pair (Zipf-skewed, but partial
    * aggregation absorbs the hot pairs per mapper — the d40 rule);
    * top-N via orderBy+limit plans as TakeOrderedAndProject (each
    * partition keeps ≤ N rows, the driver merges — never a full sort
    * of the pair vocabulary). */
  def mergePairStats(docs: DataFrame, text: Column, topN: Int): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val toks = tokens(text)
    docs.filter(size(toks) >= 2)
      .select(explode(Dedup.zipNgrams(toks, 2,
        (a, b) => concat(a, lit(" "), b))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(topN)
  }

  /** Distributed BPE tokenizer TRAINING — the iterative merge-learning
    * loop d73's single-round recount feeds (Sennrich's formulation):
    * count adjacent symbol pairs weighted by word frequency, take the
    * argmax (ties by pair string — deterministic cross-engine), apply
    * the merge corpus-wide, repeat. Returns the learned merge table
    * (merge_round, lhs, rhs, merged, pair_count).
    *
    * Scale shape: the corpus is touched ONCE (the vocabulary build —
    * one partial-agg shuffle on the Zipf word key, hot words absorbed
    * map-side); every round after that runs on the VOCABULARY table
    * (Heaps-law ~10⁸ rows at 100 TB — bounded by distinct words, not
    * corpus size), shuffling only the vocab-sized pair table. Driver
    * state is one collected argmax row per round plus the merge list
    * itself (KB at any corpus size — the d41-centroid bounded-state
    * pattern).
    *
    * The merge rewrite is a left-to-right non-overlapping fold over a
    * space-joined symbol string (accumulator: merged-so-far string;
    * step: if the accumulator's last symbol is `lhs` and the next is
    * `rhs`, fuse them, else append) — `[a a a]` under merge (a,a)
    * becomes `[aa a]`, never `[a aa]`, and a freshly merged symbol
    * can't merge again in the same round. The d82 DuckDB oracle
    * replays the whole loop as chained CTEs with the IDENTICAL
    * string-fold (`list_reduce` with the same lambda), so every
    * learned merge and count is hash-checked. */
  def bpeTrain(docs: DataFrame, text: Column, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    // cache the corpus-touching stage: without it every round's argmax
    // collect would re-scan the corpus through the lineage (N scans for
    // N rounds); the cached table is vocabulary-sized (Heaps-law
    // bounded — what a real BPE trainer materializes too)
    val vocab0 = docs.select(explode(tokens(text)).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"), split(col("w"), "").as("syms"))
      .cache()
    var vocab = vocab0
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var r = 1
    var done = false
    try {
    while (r <= rounds && !done) {
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(Dedup.zipNgrams(col("syms"), 2,
            (a, b) => concat(a, lit(" "), b))).as("p"))
        .groupBy("p").agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("p")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val Array(a, b) = top.head.getString(0).split(" ", 2)
        merges += ((r.toLong, a, b, a + b, top.head.getLong(1)))
        val first = element_at(col("syms"), 1)
        val rest = slice(col("syms"), lit(2),
          greatest(size(col("syms")) - 1, lit(0)))
        val folded = aggregate(rest, first, (acc, x) =>
          when(regexp_extract(acc, "[^ ]*$", 0) === a && x === b,
            concat(acc.substr(lit(1), length(acc) - lit(a.length)),
              lit(a + b)))
            .otherwise(concat(acc, lit(" "), x)))
        vocab = vocab.withColumn("syms", split(folded, " "))
        r += 1
      }
    }
    } finally {
      // the merge list is fully collected (or a round's collect
      // threw): release the cached base vocab either way (vocab0, not
      // the derived var — unpersisting a derivative leaves the base
      // entry alive) so repeated training calls (gate + bench reps)
      // don't accumulate cache entries even across failures
      vocab0.unpersist()
    }
    merges.result()
      .toDF("merge_round", "lhs", "rhs", "merged", "pair_count")
  }

  /** Apply a LEARNED merge list to text — [[bpeTrain]]'s ingest-side
    * counterpart (train batch-side, encode anywhere): per word, the
    * merges run in training order with the IDENTICAL
    * leftmost-non-overlapping string fold, so encode(train corpus)
    * reproduces the trainer's final symbol state exactly
    * (spec-pinned). Returns the flattened piece array per row.
    *
    * Stateless column arithmetic — streaming-safe unchanged (the
    * d76/d80/d81 ingest-gate property). The plan nests one fold per
    * merge: right for list-sized demo vocabs and for the gate; a
    * production 10k-merge tokenizer wants a native single-pass
    * expression (exactly what [[graft.functions.WordPieceEncodeExpr]]
    * demonstrates for the WordPiece family). */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column = {
    val pieces = transform(tokens(text), w => {
      var cur: Column = array_join(split(w, ""), " ")
      for ((a, b) <- merges) {
        val syms = split(cur, " ")
        val first = element_at(syms, 1)
        val rest = slice(syms, lit(2), greatest(size(syms) - 1, lit(0)))
        cur = aggregate(rest, first, (acc, x) =>
          when(regexp_extract(acc, "[^ ]*$", 0) === a && x === b,
            concat(acc.substr(lit(1), length(acc) - lit(a.length)),
              lit(a + b)))
            .otherwise(concat(acc, lit(" "), x)))
      }
      split(cur, " ")
    })
    filter(flatten(pieces), p => p =!= "")
  }

  /** Per-phrase occurrence counts over `lower(text)` via ONE
    * Aho–Corasick pass ([[graft.functions.PhraseCountsExpr]]) —
    * O(len + matches) per row regardless of wordlist size, where a
    * per-phrase `contains` chain is O(len · |list|). Matching is
    * case-insensitive on BOTH sides: the text is lowered in-plan and
    * the phrases are lowered here (a mixed-case phrase would otherwise
    * silently never match the lowered text). Counts include
    * overlapping occurrences; the d80 DuckDB oracle replays that rule
    * exactly by position scan. */
  def phraseCounts(text: Column, phrases: Seq[String]): Column =
    graft.functions.PhraseCountsExpr.column(lower(text),
      new graft.functions.PhraseAutomaton(
        phrases.map(_.toLowerCase(java.util.Locale.ROOT))))

  /** Wordlist gate — the C4 "bad words" rule generalized: per doc, the
    * total / distinct phrase hits and a keep verdict (zero hits). The
    * automaton is a codegen reference object (broadcast-bounded model,
    * the d70/d78 shape), so the stage is map-only at any corpus size:
    * no join, no shuffle, one text pass for the whole list. */
  def phraseFilter(docs: DataFrame, text: Column, id: Column,
                   phrases: Seq[String]): DataFrame = {
    // null text = zero occurrences of everything → kept (explicitly):
    // the wordlist gate judges CONTENT; dropping empty docs is the
    // length filter's job (d51). Without the coalesce, null counts
    // would propagate to null total/kept and a filter(col("kept"))
    // would drop null-text docs with no recorded verdict.
    val counts = coalesce(phraseCounts(text, phrases),
      array_repeat(lit(0L), phrases.size))
    docs.select(id.as("doc_id"), counts.as("_c"))
      .select(col("doc_id"),
        aggregate(col("_c"), lit(0L), (a, x) => a + x).as("total_hits"),
        size(filter(col("_c"), _ > 0L)).cast("long").as("distinct_hits"))
      .withColumn("kept", col("total_hits") === 0L)
  }

  /** PII scrubbing: emails first (their local part would otherwise leak
    * into the digit pass), then runs of 5+ digits (ids, phone-ish
    * numbers). Pattern subset chosen to mean the same thing in Java
    * regex and RE2. Map-only, codegen'd. */
  val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LONGNUM_RE = "[0-9]{5,}"
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EMAIL_RE, "<EMAIL>"),
      LONGNUM_RE, "<NUM>")

  /** Encoding-artifact repair — the ftfy-style pass every web-scraped
    * corpus runs before anything else: UTF-8-read-as-Latin-1 mojibake
    * ("Ã©" that should be "é"), U+FFFD replacement characters left by
    * lossy decodes, zero-width characters (ZWSP/ZWNJ/ZWJ/BOM), and
    * NBSP-for-space. The fix table is LITERAL string pairs — no regex,
    * so the repair means byte-for-byte the same thing in every engine
    * (ftfy itself is, at its core, an ordered literal-sequence fixer).
    *
    * Every mojibake pair is 2 chars → 1 char, so occurrence counts
    * fall out of character-length differences — integer columns, no
    * second scan. All characters involved are BMP code points, where
    * Spark's and DuckDB's length() agree (UTF-16 code units = code
    * points). Map-only, codegen'd: scan speed at any corpus size, and
    * stateless — streaming-safe unchanged (the d76/d80/d81
    * ingest-gate property). */
  val MOJIBAKE_PAIRS: Seq[(String, String)] = Seq(
    "\u00C3\u00A1" -> "\u00E1", // A-tilde + inv-excl  -> a-acute
    "\u00C3\u00A9" -> "\u00E9", // the same family: e-acute
    "\u00C3\u00AD" -> "\u00ED", // i-acute
    "\u00C3\u00B3" -> "\u00F3", // o-acute
    "\u00C3\u00BA" -> "\u00FA", // u-acute
    "\u00C3\u00B1" -> "\u00F1", // n-tilde
    "\u00C3\u00BC" -> "\u00FC", // u-umlaut
    "\u00C3\u00B6" -> "\u00F6", // o-umlaut
    "\u00C3\u00A4" -> "\u00E4", // a-umlaut
    "\u00C2\u00A0" -> " ") // A-circumflex + NBSP -> space (double-encoded NBSP)
  val ZERO_WIDTH_CHARS: Seq[String] =
    Seq("\u200B", "\u200C", "\u200D", "\uFEFF") // ZWSP ZWNJ ZWJ BOM

  /** (fixed, n_mojibake, n_replacement, n_zero_width, n_nbsp) as a
    * struct over a possibly-corrupted text column. NBSP → plain space
    * is length-preserving, so its count comes from a delete-probe
    * before the substitution; the other three classes count via
    * length deltas across the actual fixes. */
  def fixEncoding(text: Column): Column = {
    val mojiFixed = MOJIBAKE_PAIRS.foldLeft(text) { case (t, (pat, rep)) =>
      replace(t, lit(pat), lit(rep))
    }
    val nMoji = (length(text) - length(mojiFixed)).cast("long")
    val nNbsp = (length(mojiFixed) -
      length(replace(mojiFixed, lit("\u00A0"), lit("")))).cast("long")
    val nbspFixed = replace(mojiFixed, lit("\u00A0"), lit(" "))
    val replFixed = replace(nbspFixed, lit("\uFFFD"), lit(""))
    val nRepl = (length(nbspFixed) - length(replFixed)).cast("long")
    val zwFixed = ZERO_WIDTH_CHARS.foldLeft(replFixed) { (t, z) =>
      replace(t, lit(z), lit(""))
    }
    val nZw = (length(replFixed) - length(zwFixed)).cast("long")
    struct(zwFixed.as("fixed"), nMoji.as("n_mojibake"),
      nRepl.as("n_replacement"), nZw.as("n_zero_width"),
      nNbsp.as("n_nbsp"))
  }

  /** The d91 gate's output shape over [[fixEncoding]]: repaired text,
    * per-class counts, and the dirty verdict. One projection — the
    * streaming twin runs it on a stream unchanged. */
  def repairEncoding(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.select(id.as("doc_id"), fixEncoding(text).as("f"))
      .select(col("doc_id"), col("f.fixed").as("fixed"),
        col("f.n_mojibake").as("n_mojibake"),
        col("f.n_replacement").as("n_replacement"),
        col("f.n_zero_width").as("n_zero_width"),
        col("f.n_nbsp").as("n_nbsp"))
      .withColumn("was_dirty",
        col("n_mojibake") + col("n_replacement")
          + col("n_zero_width") + col("n_nbsp") > 0)

  /** Unicode compatibility normalization gate — the d94 shape: NFKC
    * text (via the codegen'd [[graft.functions.NfkcNormalizeExpr]])
    * plus per-class compatibility-character counts (ligature ﬁ,
    * fullwidth Ａ, superscript ², ideographic space) probed with
    * engine-exact length deltas, and the dirty verdict. Map-only and
    * stateless — scan speed at any corpus size, streaming-safe
    * unchanged. */
  def normalizeNfkc(docs: DataFrame, text: Column, id: Column): DataFrame = {
    def probe(c: Column, ch: String): Column =
      (length(c) - length(replace(c, lit(ch), lit("")))).cast("long")
    docs.select(id.as("doc_id"), text.as("_t"))
      .select(col("doc_id"),
        graft.functions.NfkcNormalizeExpr.column(col("_t")).as("normalized"),
        probe(col("_t"), "ﬁ").as("n_ligature"),
        probe(col("_t"), "Ａ").as("n_fullwidth"),
        probe(col("_t"), "²").as("n_super"),
        probe(col("_t"), "　").as("n_wspace"))
      .withColumn("was_dirty",
        col("n_ligature") + col("n_fullwidth")
          + col("n_super") + col("n_wspace") > 0)
  }

  /** Global curriculum ordering — the training-data pipeline's LAST
    * step: a total order over the corpus by (difficulty bin asc,
    * deterministic shuffle within bin) so an easy→hard schedule can
    * stream shards in position order. Same two-phase prefix-sum shape
    * as [[assignShards]] (d45): rows hash into 10⁶ buckets
    * ([[Sampling.bucket]] — engine-exact integer hash), buckets fold
    * into `groups` slices per bin, per-(bin, slice) COUNTS (a
    * bins·groups-row aggregate) are cumsummed in one KB-sized
    * unpartitioned window and broadcast back as offsets, and each
    * slice ranks only its LOCAL rows. `slice = floor(bucket·groups /
    * 10⁶)` is monotone in the intra-bin hash order, so offset + local
    * rank == the global row_number over (bin, bucket, doc_id), row
    * for row — with no corpus-sized window anywhere. */
  def curriculumOrder(docs: DataFrame, id: Column, bin: Column,
                      groups: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = 1000000L
    val base = docs.select(id.as("doc_id"), bin.cast("long").as("bin"),
        Sampling.bucket(id).as("_b"))
      // b·groups < 10⁶·groups — exact in double, so floor is the true
      // integer quotient
      .withColumn("_g", floor(col("_b") * groups / lit(B.toDouble)))
    val wg = Window.orderBy("bin", "_g")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("bin", "_g")
      .agg(count(lit(1)).as("_slice_rows"))
      // ≤ bins·groups rows: the unpartitioned window runs over a
      // KB-sized aggregate, not the corpus
      .withColumn("_offset", coalesce(sum("_slice_rows").over(wg), lit(0L)))
      .select("bin", "_g", "_offset")
    // the local-rank window must read the BASE side's keys — after the
    // aliased join both sides carry bin/_g, so unqualified names would
    // be ambiguous
    val wl = Window.partitionBy(col("b.bin"), col("b._g"))
      .orderBy(col("b._b"), col("b.doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // null-safe on bin: a doc whose difficulty metric is null (null
    // text → null token count) must keep a position, not vanish from
    // the "total order over the corpus"
    base.as("b").join(broadcast(offsets.as("o")),
        col("b.bin") <=> col("o.bin") && col("b._g") === col("o._g"))
      .withColumn("pos",
        col("o._offset") + coalesce(sum(lit(1L)).over(wl), lit(0L)))
      .select(col("b.doc_id"), col("b.bin"), col("pos"))
  }
}
