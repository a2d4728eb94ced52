package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join without a nested loop.
  *
  * Spark plans a bare `e.ts BETWEEN i.start AND i.end` join as
  * BroadcastNestedLoopJoin — O(|events|·|intervals|) comparisons, a
  * wall at 100 TB. The scale shape: BIN the time axis, explode each
  * interval onto the bins it covers (an interval of length L covers
  * ≤ L/bin + 1 bins), equi-join events to intervals on the bin — a
  * plain shuffle/broadcast hash join — then apply the exact range
  * predicate. Each event belongs to exactly ONE bin, so no dedup is
  * needed afterwards. Cost: O(events + intervals·bins_per_interval)
  * shuffled rows, instead of the cross product.
  *
  * Timestamps compare at SECOND resolution (`unix_timestamp` /
  * `floor(epoch())`) on purpose: the two gate engines carry different
  * sub-second precision (Spark micros, DuckDB nanos on this corpus),
  * and second-resolution interval membership is deterministic across
  * both. Pick `binS` ≈ the typical interval length: shorter bins
  * shrink the per-bin fan-in, longer bins shrink the interval
  * explosion factor.
  *
  * Preconditions: `events` and `intervals` must not share column names
  * (other than the internal `_bin`) — the equi-join keeps all columns
  * of both sides, so a shared name becomes an ambiguous duplicate
  * downstream; alias/prefix one side first (q19 projects before
  * calling). Inverted intervals (`end < start`) and null bounds
  * produce NO matches — same as the naive BETWEEN join — instead of
  * the reversed-bounds error a bare `sequence(lo, hi)` would throw.
  */
object RangeJoin {

  def binned(events: DataFrame, ts: Column, intervals: DataFrame,
             start: Column, end: Column, binS: Long): DataFrame = {
    val e = events.withColumn("_bin", floor(unix_timestamp(ts) / binS))
    val iv = intervals
      // dirty data guard: BETWEEN treats end<start / null as no-match;
      // sequence() would throw on reversed bounds — filter, don't fail
      .where(unix_timestamp(end) >= unix_timestamp(start))
      .withColumn("_bin",
        explode(sequence(floor(unix_timestamp(start) / binS),
          floor(unix_timestamp(end) / binS))))
    e.join(iv, Seq("_bin"))
      .filter(unix_timestamp(ts).between(unix_timestamp(start),
        unix_timestamp(end)))
      .drop("_bin")
  }
}
