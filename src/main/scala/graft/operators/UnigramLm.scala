package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{UnigramEncodeExpr, UnigramModel}

/** Distributed UNIGRAM-LM tokenizer TRAINING (SentencePiece's
  * algorithm family, Kudo 2018) — the third production tokenizer
  * trainer, completing BPE ([[TextOps.bpeTrain]], d82) and WordPiece
  * (apply-side, d78): seed a candidate piece vocabulary from
  * substring statistics, then iterate EM — E-step: Viterbi-segment
  * every vocabulary word under the current piece model; M-step:
  * re-estimate piece counts from the chosen segmentations and prune
  * pieces that received no mass (single characters are never pruned —
  * they guarantee coverage, SentencePiece's character fallback).
  *
  * This is HARD EM (Viterbi counts, not forward–backward expected
  * counts) with the quantized integer log-probs of [[UnigramModel]] —
  * both deviations are deliberate engine-exactness choices (SURVEY
  * §4 pattern): expected counts and float `ln` are
  * addition-order- and ULP-dependent, where the Viterbi argmax over
  * quantized scores is a pure integer computation a DuckDB oracle
  * replays as chained CTEs (bounded-position DP + backtrack — the
  * d82 replay-the-whole-loop rigor).
  *
  * Scale shape (the d82 contract): the corpus is touched ONCE — the
  * word-vocabulary build, one partial-agg shuffle on the Zipf word
  * key, hot words absorbed map-side. Every EM round runs on the
  * VOCABULARY table (Heaps-law bounded, ~10⁸ rows at 100 TB, cached):
  * the E-step is a map-only [[UnigramEncodeExpr]] pass (model shipped
  * as a plan reference object, KB-sized), the M-step one
  * vocab-keyed partial-agg shuffle; driver state is the piece table
  * itself (chars + topMulti rows — the k-means-centroid
  * bounded-small-state exception). Words longer than `maxWordLen`
  * are excluded from training (the rare-tail cap every production
  * trainer applies; it also bounds the oracle's DP depth).
  *
  * Returns the vocabulary TRAJECTORY in long form: (round, piece,
  * cnt) — round 0 the seed table (all single characters + the
  * `topMulti` most frequent multi-character substrings), round r ≥ 1
  * the post-EM counts after retention. */
object UnigramLm {

  def train(docs: DataFrame, text: Column, rounds: Int,
            topMulti: Int = 24, maxPieceLen: Int = 4,
            maxWordLen: Int = 12): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = docs.select(explode(TextOps.tokens(text)).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= maxWordLen)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .cache()
    try {
      // seed: substring statistics — every (position, length ≤
      // maxPieceLen) substring of every word, weighted by word
      // frequency; one vocab-sized explode + one piece-keyed
      // partial-agg shuffle
      val w = col("w"); val len = length(w)
      val subs = vocab.select(col("freq"),
          explode(flatten(transform(sequence(lit(1), len), i =>
            transform(sequence(lit(1), least(lit(maxPieceLen), len - i + 1)),
              l => w.substr(i, l))))).as("piece"))
        .groupBy("piece").agg(sum(col("freq")).as("cnt"))
      // all single characters (coverage floor) + top multi-char
      // candidates: TakeOrdered on (cnt desc, piece) — never a full
      // sort of the candidate space
      val chars = subs.filter(length(col("piece")) === 1)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val multi = subs.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece")).limit(topMulti)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      var pieces: Seq[(String, Long)] = (chars ++ multi).toSeq.sortBy(_._1)
      val out = Seq.newBuilder[(Long, String, Long)]
      pieces.foreach { case (p, c) => out += ((0L, p, c)) }
      var r = 1
      while (r <= rounds) {
        val model = new UnigramModel(pieces)
        // E+M in one vocab pass: Viterbi pieces per word (map-only,
        // codegen'd), counts re-estimated with one partial-agg
        // shuffle; the result is piece-table-sized — collected
        val observed = vocab.select(col("freq"),
            explode(UnigramEncodeExpr.column(col("w"), model)).as("piece"))
          .groupBy("piece").agg(sum(col("freq")).as("cnt"))
          .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
        // retention: characters keep a count floor of 1 (never
        // pruned — coverage), multi-char pieces without mass drop
        pieces = pieces.flatMap { case (p, _) =>
          val c = observed.getOrElse(p, 0L)
          if (p.length == 1) Some(p -> math.max(c, 1L))
          else if (c > 0L) Some(p -> c) else None
        }
        pieces.foreach { case (p, c) => out += ((r.toLong, p, c)) }
        r += 1
      }
      spark.createDataFrame(out.result()).toDF("round", "piece", "cnt")
    } finally vocab.unpersist()
  }
}
