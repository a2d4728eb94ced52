package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-time data layout for multi-dimensional locality — Z-order
  * (Morton) clustering, the organization step a 100 TB warehouse runs
  * BEFORE queries ever see the data. At that scale the dominant read
  * cost is scan I/O, and parquet row-group min/max pruning only works
  * when the layout CLUSTERS the filter keys: sorting by one key gives
  * perfect pruning on it and none on any other, so the common
  * two-predicate scan (`user BETWEEN … AND ts BETWEEN …`,
  * `host × crawl-date`, `domain × shard`) reads the whole table.
  * Interleaving the keys' bits into one sort value makes every file
  * cover a small RECTANGLE of the key space — a range box touches
  * O(perimeter) files instead of all of them, on BOTH keys at once.
  *
  * Everything here is exact 64-bit integer arithmetic (shifts, masks,
  * adds — no hashing, no floats): the z-value of a row is
  * bit-identical across engines, so layouts are reproducible and the
  * whole path is DuckDB-oracle-checkable (d71).
  *
  * Scale shape: [[zValue]] is map-only codegen; [[clusterByZ]] is the
  * ONE range shuffle any clustered write pays (range boundaries from
  * Spark's reservoir sample of the z column — balanced output files
  * even when the key distribution is skewed); [[zBlocks]] is a
  * partial-agg count keyed by z-prefix — at most 2^(2·bits −
  * blockShift) keys, map-side combined. */
object Layout {

  /** Morton z-value: the low `bits` bits of x and y interleaved
    * (x even positions, y odd). Keys are clipped into [0, 2^bits) by
    * a wrapping pmod — callers whose key range exceeds 2^bits should
    * pre-scale (divide) rather than rely on the wrap, which destroys
    * locality at the wrap seam. `2·bits ≤ 62` keeps the result a
    * non-negative long. */
  def zValue(x: Column, y: Column, bits: Int = 31): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val m = 1L << bits
    val xb = pmod(x.cast("long"), lit(m))
    val yb = pmod(y.cast("long"), lit(m))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** Cluster a table for 2-D locality: range-partition on the
    * z-value, sort within partitions — each output file then covers a
    * contiguous z-run, i.e. a bounded rectangle of (x, y) space, and
    * parquet min/max footers prune on BOTH columns. This is the
    * write-side twin of the CorpusStore bucketing: bucketing co-locates
    * JOINS, z-clustering co-locates RANGE SCANS. */
  def clusterByZ(df: DataFrame, x: Column, y: Column,
                 bits: Int = 31, partitions: Int = 32): DataFrame = {
    val withZ = df.withColumn("_z", zValue(x, y, bits))
    withZ.repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** Layout report — the pruning metric a table optimizer inspects:
    * group rows by z-prefix block (`z >> blockShift`, each block = one
    * would-be file) and report per-block row counts and per-key
    * min/max spans. Tight spans ⇒ a range predicate on either key
    * skips most blocks. Deterministic, so d71 hash-checks it. */
  def zBlocks(df: DataFrame, x: Column, y: Column,
              bits: Int = 31, blockShift: Int = 54): DataFrame = {
    require(blockShift >= 0 && blockShift < 2 * bits,
      s"blockShift must be in [0, ${2 * bits}), got $blockShift")
    // report spans on the SAME clipped keys the z-value groups by:
    // raw-key spans would silently mix distant values whenever a key
    // exceeds 2^bits and wraps — the report must stay coherent with
    // its own blocking even on out-of-range input
    val m = 1L << bits
    df.select(pmod(x.cast("long"), lit(m)).as("_x"),
        pmod(y.cast("long"), lit(m)).as("_y"),
        shiftright(zValue(x, y, bits), blockShift).as("z_block"))
      .groupBy("z_block")
      .agg(count(lit(1)).as("n"),
        min(col("_x")).as("min_x"), max(col("_x")).as("max_x"),
        min(col("_y")).as("min_y"), max(col("_y")).as("max_y"))
  }
}
