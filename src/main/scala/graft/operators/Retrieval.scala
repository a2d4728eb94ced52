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
  * not a window sort over every candidate. A real engine would also
  * prune stopword postings (WAND / df cutoff) before the probe join;
  * that is a candidate-set optimization, not a semantics change.
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
