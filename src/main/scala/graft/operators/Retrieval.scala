package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval over an inverted index — the BM25 ranking every
  * RAG corpus build and retrieval-based decontamination pass starts
  * from (score the training corpus against benchmark queries, drop
  * the hits). The index here is not a separate structure: on Spark
  * the (token → doc postings) table IS the inverted index, built by
  * one explode + partial aggregate and kept distributed.
  *
  * Cross-engine exactness: BM25's k1/b saturation is evaluated as an
  * exact rational — with k1 = 6/5, b = 3/4, S = Σ dl, N = #docs,
  *
  *   tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/S))
  *     = 22·tf·S / (10·tf·S + 3·S + 9·dl·N)
  *
  * so numerator and denominator are 64-bit integers; the linear idf
  * N/df (same ranking trade as [[TextOps.tfidfTopTerms]] — ln() would
  * differ in the last ulp) enters through ONE fixed-shape double
  * expression `floor(10⁶·N · num / den)`, identical IEEE op sequence
  * in Spark and the oracle, and the per-term scores are summed as
  * LONGS — order-independent under shuffle, where a float-score sum
  * would hash-differ run to run. The integer products stay below 2⁶³
  * through corpus sizes of ~10¹² tokens; past that, swap the num/den
  * columns to DECIMAL(38,0) (the [[Sampling.domainMix]] treatment).
  *
  * Scale shape: the postings table shuffles once on (doc_id, token)
  * partial-agg; the query term set (#queries · terms) is tiny and
  * BROADCAST, and document frequencies are computed AFTER the
  * postings are restricted to query tokens, so the df broadcast is
  * query-bounded, never vocabulary-bounded (a full-vocabulary df
  * table at 100 TB is ~10⁹ rows — not broadcastable). The corpus is
  * never shuffled for the probe. Per-(query, doc) scores
  * are one partial-agg shuffle keyed by (q_id, doc_id) — skew-free —
  * and ranking is the O(k)-state [[graft.functions.TopKByScore]] heap,
  * not a window sort over every candidate. WAND-style df-cutoff
  * pruning is implemented as [[bm25TopKPruned]]/[[bm25FromIndexPruned]]
  * (spec-pinned top-k-identical); the gates keep THIS path because
  * the crossover is real and measured — see the pruned variant's doc.
  */
object Retrieval {

  /** The postings table — (doc_id, dl, token, tf), one row per
    * (doc, term): the inverted index in relational form. Built by one
    * explode + partial aggregate; dl is carried through the aggregate
    * (functionally dependent on doc_id, costs nothing). Materialize
    * this once (parquet, bucketed by token) and every query probe
    * skips the corpus re-tokenization — the [[bm25FromIndex]] /
    * d66 deployment shape, same trade the slurm warehouse twins
    * (s26/s27) measure. */
  def postings(docs: DataFrame, text: Column, id: Column): DataFrame = {
    val toks = TextOps.tokens(text)
    docs
      .select(id.as("doc_id"), size(toks).cast("long").as("dl"),
        explode(toks).as("token"))
      .groupBy("doc_id", "dl", "token")
      .agg(count(lit(1)).as("tf"))
  }

  /** Top-k BM25 hits per query: (q_id, rank, doc_id, score) with
    * score the summed scaled-integer term score (ties broken by
    * smaller doc_id). A query doc never retrieves itself. */
  def bm25TopK(docs: DataFrame, text: Column, id: Column,
               queries: DataFrame, qText: Column, qId: Column,
               k: Int): DataFrame = {
    val toks = TextOps.tokens(text)
    // corpus globals (one extra pruned scan to a 1-row aggregate)
    val g = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(toks).cast("long")).as("s_tokens"))
    probe(postings(docs, text, id), g, queries, qText, qId, k)
  }

  /** BM25 over a MATERIALIZED postings table: document frequencies and
    * corpus globals derive from pruned index scans — the corpus text
    * is never re-tokenized per query batch. (Every doc yields ≥ 1
    * postings row — split("") is [""] — so the distinct-doc globals
    * equal [[bm25TopK]]'s corpus-scan globals and both paths return
    * identical hits.) */
  def bm25FromIndex(post: DataFrame, queries: DataFrame,
                    qText: Column, qId: Column, k: Int): DataFrame = {
    val g = post.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("s_tokens"))
    probe(post, g, queries, qText, qId, k)
  }

  private def probe(tf: DataFrame, g: DataFrame, queries: DataFrame,
                    qText: Column, qId: Column, k: Int): DataFrame = {
    val q = queries.select(qId.as("q_id"),
      explode(array_distinct(TextOps.tokens(qText))).as("token"))
    // Restrict postings to query tokens BEFORE counting document
    // frequencies: df per surviving token is unchanged (the filter is
    // token-wise), but the df table shrinks from the full vocabulary
    // (Heaps-law ~10^9 tokens at 100 TB — an executor-OOM broadcast)
    // to the query term set. The distinct-token join (not q itself)
    // keeps postings un-multiplied when two queries share a term.
    val qtok = q.select(col("token")).distinct()
    val dfreq = tf.join(broadcast(qtok), "token")
      .groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(q), "token")
      .filter(col("doc_id") =!= col("q_id"))
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(g))
      .withColumn("num", lit(22L) * col("tf") * col("s_tokens"))
      .withColumn("den", col("df") * (lit(10L) * col("tf") * col("s_tokens")
        + lit(3L) * col("s_tokens") + lit(9L) * col("dl") * col("n_docs")))
      .withColumn("t_score",
        floor(lit(1000000.0) * col("n_docs") * col("num") / col("den"))
          .cast("long"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("t_score")).as("score"))
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.column(
        col("score").cast("double"), col("doc_id"), lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("doc_id"), col("t.score").cast("long").as("score"))
  }

  /** [[bm25TopK]] with WAND-style DF-CUTOFF candidate pruning — the
    * optimization the classic probe documents as a follow-up: terms
    * whose document frequency exceeds `n_docs · fracNum/fracDen`
    * (stopwords — by default present in more than HALF the corpus)
    * are dropped from CANDIDATE GENERATION only. Scoring then runs
    * over ALL query terms restricted to the candidate (q, doc) pairs,
    * so every kept doc's score is bit-identical to the unpruned
    * probe's — the cut is a candidate-set rule, never a semantics
    * change to scores (spec-pinned top-k-identical on the gate
    * corpus).
    *
    * Exactness caveat, stated honestly: a doc matching ONLY stopword
    * terms of a query leaves the candidate set — the standard WAND
    * trade (such docs score near the bottom; they cannot reach a
    * top-k dominated by docs matching selective terms unless k
    * exceeds the candidate count). A query whose EVERY term is a
    * stopword falls back to its full term set, so no query ever
    * returns fewer hits than it has candidates.
    *
    * Scale shape: the win is twofold at 100 TB — the probe explosion
    * `postings ⋈ query-terms` runs over postings SEMI-FILTERED to
    * candidate docs (stopword posting lists, the longest in the
    * index, no longer fan out against every doc), and the
    * (q_id, doc_id) partial-agg shuffle shrinks to candidates.
    * Candidate pairs are broadcast here (the bounded-benchmark-batch
    * decontamination shape — selective terms are rare by
    * construction, so Σ df over them is small); a corpus-scale query
    * set swaps the two broadcasts for shuffle semi-joins, one line
    * each.
    *
    * MEASURED crossover (r13, sf0.1, min-of-5 alternating in one
    * JVM): classic 2.56 s, pruned 4.41 s — the gate's queries are
    * FULL DOCUMENTS (hundreds of mostly-rare terms), so the candidate
    * set is nearly the whole corpus and the extra pass is pure
    * overhead. The pruning wins when queries are short (benchmark
    * decontamination batches) over corpora whose stopword posting
    * lists dominate the probe — the d60/d66 GATES therefore keep the
    * classic probe, and this variant is the documented scale path for
    * the short-query regime. */
  def bm25TopKPruned(docs: DataFrame, text: Column, id: Column,
                     queries: DataFrame, qText: Column, qId: Column,
                     k: Int, fracNum: Long = 1L, fracDen: Long = 2L): DataFrame = {
    val toks = TextOps.tokens(text)
    val g = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(toks).cast("long")).as("s_tokens"))
    probePruned(postings(docs, text, id), g, queries, qText, qId, k,
      fracNum, fracDen)
  }

  /** [[bm25FromIndex]] with the same df-cutoff pruning — the d66
    * materialized-index deployment shape. */
  def bm25FromIndexPruned(post: DataFrame, queries: DataFrame,
                          qText: Column, qId: Column, k: Int,
                          fracNum: Long = 1L, fracDen: Long = 2L): DataFrame = {
    val g = post.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("s_tokens"))
    probePruned(post, g, queries, qText, qId, k, fracNum, fracDen)
  }

  private def probePruned(tf: DataFrame, g: DataFrame, queries: DataFrame,
                          qText: Column, qId: Column, k: Int,
                          fracNum: Long, fracDen: Long): DataFrame = {
    val q = queries.select(qId.as("q_id"),
      explode(array_distinct(TextOps.tokens(qText))).as("token"))
    val qtok = q.select(col("token")).distinct()
    val dfreq = tf.join(broadcast(qtok), "token")
      .groupBy("token").agg(count(lit(1)).as("df"))
    // phase 1 — candidate generation from SELECTIVE terms only:
    // df·fracDen <= n_docs·fracNum (integer, no float threshold);
    // a query with no selective term falls back to all its terms
    val qdf = q.join(broadcast(dfreq), "token").crossJoin(broadcast(g))
      .withColumn("selective",
        col("df") * lit(fracDen) <= col("n_docs") * lit(fracNum))
    val anySel = qdf.groupBy("q_id")
      .agg(max(col("selective")).as("any_selective"))
    val candTerms = qdf.join(broadcast(anySel), "q_id")
      .filter(col("selective") || !col("any_selective"))
      .select("q_id", "token")
    val candPairs = tf.join(broadcast(candTerms), "token")
      .filter(col("doc_id") =!= col("q_id"))
      .select("q_id", "doc_id").distinct()
    val candDocs = candPairs.select("doc_id").distinct()
    // phase 2 — FULL-term scoring, restricted to candidates: scores
    // for kept docs are bit-identical to the unpruned probe's
    val tfC = tf.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
    val scored = tfC
      .join(broadcast(q), "token")
      .join(broadcast(candPairs), Seq("q_id", "doc_id"), "left_semi")
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(g))
      .withColumn("num", lit(22L) * col("tf") * col("s_tokens"))
      .withColumn("den", col("df") * (lit(10L) * col("tf") * col("s_tokens")
        + lit(3L) * col("s_tokens") + lit(9L) * col("dl") * col("n_docs")))
      .withColumn("t_score",
        floor(lit(1000000.0) * col("n_docs") * col("num") / col("den"))
          .cast("long"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("t_score")).as("score"))
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.column(
        col("score").cast("double"), col("doc_id"), lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("doc_id"), col("t.score").cast("long").as("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) — the standard
    * hybrid-retrieval combiner: each input ranking contributes
    * `1/(c + rank)` per (query, doc) and the fused list re-ranks by
    * the sum. Rank-space fusion is what makes lexical + dense hybrid
    * retrieval work without score calibration: BM25's scaled-integer
    * scores and cosine's [-1, 1] never meet — only their RANKS do, so
    * ANY candidate generator plugs in unchanged (brute-force cosine
    * here; the IVF / LSH / PQ paths at scale).
    *
    * Cross-engine exactness: the contribution is the INTEGER quotient
    * `10⁹ div (c + rank)` summed as longs — order-independent under
    * shuffle, and bit-identical in any engine with integer division
    * (a float 1/(c+r) sum would be addition-order-dependent). With
    * c = 60 and rank ≥ 1 each term is ≤ 16 393 442; a doc appearing in
    * every list of a thousand-way fusion stays far below 2⁶³.
    *
    * Scale shape: inputs are top-k lists — #queries · k rows, tiny
    * relative to the corpus that produced them — so the fusion itself
    * is one partial-agg shuffle keyed by (q_id, doc_id) plus the
    * O(k)-state [[graft.functions.TopKByScore]] heap per query. No
    * corpus scan, no window sort. Ties break toward the smaller
    * doc_id (the heap's id-ascending tie rule, same as [[bm25TopK]]).
    *
    * Inputs must expose (q_id, rank, doc_id); extra columns are
    * dropped. */
  /** d155: hybrid RRF fusion with the SCALE dense arm — the d90 shape
    * but the dense candidate generator is [[Similarity.ivfTopK]]
    * (map-only cell argmax + a candidates-only join) instead of the
    * corpus×queries brute-force scorer. d90 keeps the brute arm as
    * the ORACLE-EXACTNESS choice (its DuckDB twin replays exact
    * cosine ranks); this is the plan you'd deploy at 100×, gated in
    * the d13 verdict form because the k-means cell state is
    * engine-specific float: in-plan BOOLEAN verdicts over an
    * oracle-computable total.
    *
    *  - `n_bf`: brute dense top-k row count (#queries · k — the
    *    oracle recomputes it from the tables);
    *  - `dense_recall_ok`: IVF dense arm recall@k vs the in-plan
    *    brute arm above `denseRecallFloorPct` (empirical margin —
    *    the d13 floor discipline);
    *  - `fused_overlap_ok`: the IVF-armed fused top-k overlaps the
    *    brute-armed fused top-k above `fusedOverlapFloorPct` — the
    *    end-to-end claim that swapping the candidate generator
    *    preserves the fusion, which is the property a user switching
    *    d90 to the scale plan actually relies on. The lex arm is
    *    shared by both fusions, so this floor sits well above the
    *    raw dense recall. */
  def rrfIvfVerdict(docs: DataFrame, text: Column, id: Column,
                    queriesLex: DataFrame, qText: Column, qId: Column,
                    emb: DataFrame, queriesEmb: DataFrame, k: Int,
                    denseRecallFloorPct: Int = 30,
                    fusedOverlapFloorPct: Int = 40,
                    centroids: Option[Array[Array[Double]]] = None,
                    post: Option[DataFrame] = None): DataFrame = {
    // r16: the SCALE-plan gate takes the scale-plan lex arm too —
    // `post` supplies the materialized postings index (the d66
    // warehouse), whose hits are pinned IDENTICAL to the corpus-scan
    // probe (shared d60/d66 oracle; OperatorsSpec), so the verdict is
    // unchanged while the per-run corpus re-tokenization goes away.
    val lex = post
      .map(p => bm25FromIndex(p, queriesLex, qText, qId, k))
      .getOrElse(bm25TopK(docs, text, id, queriesLex, qText, qId, k))
    def denseArm(ann: DataFrame) = ann.select(col("q_id"), col("rank"),
      col("neighbor_id").as("doc_id"))
    val bf = denseArm(Similarity.bruteForceTopK(emb, queriesEmb, k))
    val ivf = denseArm(Similarity.ivfTopK(emb, queriesEmb, k,
      centroids = centroids))
    val fusedBf = rrfFuse(Seq(lex, bf), k).select(col("q_id"), col("doc_id"))
    val fusedIvf = rrfFuse(Seq(lex, ivf), k).select(col("q_id"), col("doc_id"))
    val pairs = Seq("q_id", "doc_id")
    val denseHits = ivf.select(col("q_id"), col("doc_id"))
      .join(bf.select(col("q_id"), col("doc_id")), pairs, "left_semi")
      .agg(count(lit(1)).as("_dh"))
    val overlap = fusedIvf.join(fusedBf, pairs, "left_semi")
      .agg(count(lit(1)).as("_oh"))
    bf.agg(count(lit(1)).as("n_bf"))
      .crossJoin(denseHits)
      .crossJoin(overlap)
      .crossJoin(fusedBf.agg(count(lit(1)).as("_nfb")))
      .select(col("n_bf"),
        (col("_dh") * 100L >= col("n_bf") * denseRecallFloorPct)
          .as("dense_recall_ok"),
        (col("_oh") * 100L >= col("_nfb") * fusedOverlapFloorPct)
          .as("fused_overlap_ok"))
  }

  def rrfFuse(lists: Seq[DataFrame], k: Int, c: Long = 60L): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranking")
    val normalized = lists.map(_.select(col("q_id"), col("rank"), col("doc_id")))
    val contrib = normalized.reduce(_.unionByName(_))
      .withColumn("contrib", expr(s"1000000000L div (${c}L + rank)"))
    val fused = contrib
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("rrf_score"))
    fused.groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.column(
        col("rrf_score").cast("double"), col("doc_id"), lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("doc_id"), col("t.score").cast("long").as("rrf_score"))
  }
}
