package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §6).
  *
  * AQE's skew-join handles skew that materializes in shuffle files; a
  * salt is the planner-independent form that also works for skewed
  * aggregations and for engines/configs where AQE can't split (e.g.
  * a single giant key inside one reducer). Mechanics: the skewed
  * (large) side gets a random-but-deterministic salt in [0, n); the
  * small side is replicated n ways; the join key becomes (key, salt).
  */
object SkewJoin {

  /** Deterministic per-row salt derived from the row's other column —
    * repeatable runs, unlike rand(). */
  private def salt(c: Column, n: Int): Column = pmod(xxhash64(c), lit(n))

  /** Join `big` (skewed on `key`) with `small`, salting n ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltBy: String, n: Int = 8): DataFrame = {
    val b = big.withColumn("_salt", salt(col(saltBy), n))
    val s = small.withColumn("_salt_i", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("_salt", col("_salt_i").cast("long")).drop("_salt_i")
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-safe aggregation: partial agg on (key, salt), then
    * final agg on key — caps any single reducer's input at ~1/n of the
    * hottest key. (Spark's partial aggregation usually covers this;
    * the explicit form is for aggregates without cheap combiners,
    * e.g. collect-like or sketch merges.) */
  def saltedCount(df: DataFrame, key: String, saltBy: String, n: Int = 8): DataFrame =
    df.withColumn("_salt", salt(col(saltBy), n))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_c"))
      .groupBy(col(key))
      .agg(sum(col("_c")).as("n_rows"))
}
