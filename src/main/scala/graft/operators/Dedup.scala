package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Round.rd

/** Deduplication operators (SURVEY §2.5 #40-43), designed for the
  * 100 TB path: exact dedup is one hash aggregate; near-dup never goes
  * O(n²) — MinHash/SimHash band buckets bound the candidate set and the
  * expensive verification (Jaccard) runs only on bucket-mates.
  */
object Dedup {

  /** Exact dedup: content-hash groupBy; keeper = min id per group. */
  def exact(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.groupBy(md5(text).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(id).as("keeper_id"))

  /** Distinct 3-token shingles of a document. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = TextOps.tokens(text)
    val n = size(toks)
    when(n >= k,
      array_distinct(transform(sequence(lit(0), n - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** MinHash signature: numPerms permutations h_i(x) = (a_i·x + b_i)
    * mod p over xxhash64 shingle hashes; one array column, map-only. */
  def minhashSignature(text: Column, numPerms: Int = 32): Column = {
    val p = 2305843009213693951L // 2^61 - 1 (Mersenne prime)
    val rnd = new scala.util.Random(42)
    val coefs = Seq.fill(numPerms)((math.abs(rnd.nextLong()) % (p - 1) + 1,
      math.abs(rnd.nextLong()) % p))
    val sh = shingles(text)
    array(coefs.map { case (a, b) =>
      array_min(transform(sh, s => pmod(pmod(xxhash64(s), lit(p)) * a + b, lit(p))))
    }: _*)
  }

  /** LSH banding: explode the signature into (band_idx, band_hash).
    * Docs sharing any band land in the same bucket — one shuffle on
    * (band, hash), never a cartesian. bands×rows must = numPerms. */
  def lshBands(docs: DataFrame, text: Column, id: Column,
               bands: Int = 8, rows: Int = 4): DataFrame = {
    val withSig = docs.select(id.as("doc_id"),
      minhashSignature(text, bands * rows).as("sig"))
    withSig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", transform(slice(col("sig"), b * rows + 1, lit(rows)),
          x => x.cast("string")))))).as(Seq("band_idx", "band_hash")))
  }

  /** MinHash+LSH near-dup candidate pairs (doc_a < doc_b). */
  def minhashCandidates(docs: DataFrame, text: Column, id: Column,
                        bands: Int = 8, rows: Int = 4): DataFrame = {
    val b = lshBands(docs, text, id, bands, rows)
    val l = b.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_a"))
    val r = b.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_b"))
    l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** n-gram Jaccard verification over candidate pairs only. */
  def jaccardVerify(candidates: DataFrame, docs: DataFrame,
                    text: Column, id: Column, minJaccard: Double): DataFrame = {
    val sh = docs.select(id.as("jid"), shingles(text).as("sh"))
    candidates
      .join(sh.withColumnRenamed("jid", "doc_a").withColumnRenamed("sh", "sh_a"), Seq("doc_a"))
      .join(sh.withColumnRenamed("jid", "doc_b").withColumnRenamed("sh", "sh_b"), Seq("doc_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), rd(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash fingerprint: per-bit ±1 votes over token hashes.
    * Map-only (aggregate over the token array — no explode shuffle). */
  def simhash(text: Column): Column = {
    val hashes = transform(TextOps.tokens(text), t => xxhash64(t))
    val bitCols = (0 until 64).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << j)).otherwise(0L)
    }
    bitCols.reduce(_ bitwiseOR _)
  }

  /** SimHash near-dup pairs: 4×16-bit band blocking (any equal band ⇒
    * candidate — catches all pairs with hamming ≤ 3), verified by
    * bit_count(xor) ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, text: Column, id: Column,
                   maxHamming: Int = 3): DataFrame = {
    val f = docs.select(id.as("doc_id"), simhash(text).as("fp"))
    val banded = f.select(col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("fp"), b * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("band_idx", "band_val")))
    val l = banded.select(col("band_idx"), col("band_val"),
      col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val r = banded.select(col("band_idx"), col("band_val"),
      col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    l.join(r, Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
