package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-means++ seed-sample bound (the r13 verdict finding): the sample
  * must SCALE with nCells. With the old fixed 4096-vector sample,
  * nCells ≥ 4096 silently capped distinct seeds at the sample size —
  * the repeat-pad filled the remainder with copies of seed 0, so cell
  * granularity quietly collapsed. Lives in package graft.operators to
  * reach the private[operators] seeding entry directly. */
class SeedBoundSpec extends AnyFunSuite {

  lazy val spark = graft.SparkTestSession.get

  /** A deterministic 2-d corpus with far more distinct points than the
    * old 4096 cap — values on a 200×N grid so no two ids collide. */
  private def grid(n: Int) =
    spark.range(n).select(col("id").as("vec_id"),
      array((col("id") % 200).cast("double"),
        (col("id") / lit(200)).cast("double")).as("v"))

  test("seeding yields nCells DISTINCT seeds past the old 4096-sample cap") {
    val nCells = 4500
    val seeds = Similarity.kmeansPlusPlusSeeds(grid(12000), nCells,
      euclidean = true)
    assert(seeds.length == nCells)
    val distinct = seeds.map(_.toSeq).toSet.size
    assert(distinct == nCells,
      s"only $distinct distinct seeds of $nCells — the sample cap is back")
  }

  test("fewer distinct vectors than seats still terminates (repeat-pad)") {
    val seeds = Similarity.kmeansPlusPlusSeeds(grid(10), 64, euclidean = true)
    assert(seeds.length == 64)
    assert(seeds.map(_.toSeq).toSet.size == 10)
  }
}
