package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** JaccardSimExpr (the fused near-dup verifier) vs the composed
  * `size(array_intersect) / size(array_union)` form it replaced —
  * equal on ARBITRARY string arrays: duplicates, empties, null
  * elements, null arrays. The composed form runs in the same plan so
  * any semantic drift (distinct handling, null-element counting, NULL
  * on empty-over-empty) fails loudly. */
class JaccardSimSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private val elemGen: Gen[String] =
    Gen.oneOf(Gen.oneOf("a b c", "b c d", "x", "", "a b c"),
      Gen.listOfN(2, Gen.alphaLowerChar).map(_.mkString(" ")))

  private val arrGen: Gen[List[String]] =
    Gen.choose(0, 10).flatMap(Gen.listOfN(_, elemGen))

  test("fused == composed on random arrays (dups, empties included)") {
    import spark.implicits._
    val cases = Gen.listOfN(60, Gen.zip(arrGen, arrGen)).sample.get
    val df = cases.toDF("a", "b")
    val got = df.select(
      graft.functions.JaccardSimExpr.column(col("a"), col("b")).as("fused"),
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b")))).as("composed"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) {
        val (f, c) = (r.getDouble(0), r.getDouble(1))
        assert(f == c || (f.isNaN && c.isNaN), s"fused=$f composed=$c")
      }
    }
  }

  test("null elements match; a NULL ARRAY is NULL, not the composed form's 1.0") {
    import spark.implicits._
    val cases: Seq[(Seq[String], Seq[String])] = Seq(
      (Seq("a", null, "b"), Seq("b", null)),
      (Seq(null, null), Seq(null)),
      (Seq("a"), Seq(null)),
      (Seq.empty[String], Seq.empty[String]))
    val df = cases.toDF("a", "b")
    val got = df.select(
      graft.functions.JaccardSimExpr.column(col("a"), col("b")).as("fused"),
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b")))).as("composed"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) {
        val (f, c) = (r.getDouble(0), r.getDouble(1))
        assert(f == c || (f.isNaN && c.isNaN), s"fused=$f composed=$c")
      }
    }
    // DELIBERATE deviation: on a NULL array the composed form scores
    // the pair jaccard = 1.0 — size(NULL) is -1 under the legacy
    // default, so -1/-1 silently marks the pair an exact duplicate.
    // The fused expression returns NULL (the pair fails the >= filter
    // instead of passing at full similarity). Unreachable in the gate
    // (Dedup.shingles never yields a null array) but pinned so the
    // fix can't regress either way.
    val nulls = Seq((null: Seq[String], Seq("a"))).toDF("a", "b")
    assert(nulls.select(
      graft.functions.JaccardSimExpr.column(col("a"), col("b")))
      .head.isNullAt(0))
    assert(nulls.select(
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_union(col("a"), col("b")))))
      .head.getDouble(0) == 1.0)
  }

  test("jaccard_sim is callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT jaccard_sim(array('a','b','c'), array('b','c','d')) AS j")
      .head.getDouble(0)
    assert(r == 0.5)
  }
}
