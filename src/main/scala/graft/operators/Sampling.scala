package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. Keep decisions
  * derive from the row's id via a multiplicative (Knuth) hash — pure
  * integer arithmetic, so the sample is reproducible across runs,
  * partitionings, and engines (Spark's `hash()` and DuckDB's `hash()`
  * differ; `((id · 2654435761) mod 2³²) mod 10⁶` is identical
  * everywhere). The mod-2³² step makes the contract hold for ALL long
  * ids: Java's long multiply wraps mod 2⁶⁴, and since 2³² divides 2⁶⁴
  * the wrapped product mod 2³² equals the true product mod 2³² — while
  * an engine with checked arithmetic (DuckDB) computes the same value
  * via a wider type (`id::HUGEINT * K % 2^32`). Without it the two
  * engines diverge for ids above ~3.4·10⁹ (silent wrap vs overflow
  * error). Map-only: the filter runs at scan speed, no shuffle, and
  * survives any repartitioning because nothing depends on row order.
  */
object Sampling {
  private val KNUTH = 2654435761L // 2^32 · φ⁻¹, Knuth multiplicative hash
  private val BUCKETS = 1000000L
  private val M32 = 4294967296L   // 2^32

  /** Pseudo-random bucket in [0, 10⁶) from an integer id. */
  def bucket(id: Column): Column =
    pmod(pmod(id.cast("long") * KNUTH, lit(M32)), lit(BUCKETS))

  /** Stratified sample: per-stratum keep fractions (stratum → rate);
    * rows of unlisted strata keep `default`. The per-row decision is
    * `bucket(id) < rate · 10⁶`, so enlarging a rate strictly grows the
    * sample (nested samples — useful for scaling-law data ladders). */
  def stratified(df: DataFrame, stratum: Column, id: Column,
                 rates: Map[String, Double],
                 default: Double = 0.0): DataFrame = {
    val thresh = rates.foldLeft(lit((default * BUCKETS).toLong)) {
      case (acc, (s, r)) => when(stratum === s, lit((r * BUCKETS).toLong)).otherwise(acc)
    }
    df.filter(bucket(id) < thresh)
  }
}
