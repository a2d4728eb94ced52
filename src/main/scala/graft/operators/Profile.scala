package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Round.rd

/** Table profiling — the ANALYZE/data-quality pass run before
  * committing a 100 TB table to a training mix: per-column null
  * counts, exact distinct cardinalities, and value ranges, plus
  * fixed-width histograms for distribution eyeballing.
  *
  * Scale shape: [[numeric]] is ONE aggregation pass over one scan —
  * every per-column statistic is an agg expression in the same
  * GROUP BY (), and the row-per-column layout is a map-only
  * array-explode of the single 1-row result. The exact
  * count(DISTINCT) set rewrites to one Expand + two-phase aggregate
  * (input amplification × #profiled columns — the price of exactness;
  * swap to approx_count_distinct's mergeable HLL state for the 100 TB
  * run, same plan minus the Expand). [[histogram]] is a partial-agg
  * count keyed by bucket — at most `lo..hi` keys regardless of table
  * size, map-side combined. */
object Profile {

  /** Per-column stats for numeric columns: (col_name, n_rows, n_nulls,
    * n_distinct, min_val, max_val) — one row per profiled column, all
    * from a single scan. */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numeric profiling needs at least one column")
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"${c}__nn"),
      countDistinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("double").as(s"${c}__mn"),
      max(col(c)).cast("double").as(s"${c}__mx")) }
    val allAggs = count(lit(1)).as("__rows") +: aggs
    val wide = df.agg(allAggs.head, allAggs.tail: _*)
    val perCol = array(cols.map(c => struct(
      lit(c).as("col_name"),
      col("__rows").as("n_rows"),
      (col("__rows") - col(s"${c}__nn")).as("n_nulls"),
      col(s"${c}__nd").as("n_distinct"),
      rd(col(s"${c}__mn"), 6).as("min_val"),
      rd(col(s"${c}__mx"), 6).as("max_val"))): _*)
    wide.select(explode(perCol).as("p")).select("p.*")
  }

  /** Fixed-width histogram of `value`: bucket = floor(value / width)
    * (one deterministic double division — identical IEEE op in any
    * engine), count per bucket. NULLs are excluded (no bucket). */
  def histogram(df: DataFrame, value: Column, width: Double): DataFrame =
    df.filter(value.isNotNull)
      .groupBy(floor(value.cast("double") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
}
