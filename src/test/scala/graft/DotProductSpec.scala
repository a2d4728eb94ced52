package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Pins the native dot_product expression to the composed
  * zip_with+aggregate form on every edge: normal vectors, length
  * mismatch (NULL), NULL element (NULL), empty arrays (0.0), and
  * float-sum ordering (bit-exact equality, not approximate — the
  * DuckDB oracles depend on left-to-right summation). */
class DotProductSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def pairs = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.1, 0.2, 0.3, 0.4), Seq(0.9, 0.8, 0.7, 0.6)),
    (3L, Seq.empty[Double], Seq.empty[Double]),
    (4L, Seq(1e300, 1.0, -1e300), Seq(1.0, 1.0, 1.0)),
    (5L, Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))) // length mismatch
    .toDF("id", "a", "b")

  test("native dot_product is bit-exact equal to the composed form") {
    val df = pairs.select(col("id"),
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotComposed(col("a"), col("b")).as("composed"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch on id=${r.getLong(0)}")
      if (!r.isNullAt(1))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
          s"value mismatch on id=${r.getLong(0)}")
    }
    assert(rows.find(_.getLong(0) == 5L).get.isNullAt(1), "length mismatch → NULL")
    assert(rows.find(_.getLong(0) == 3L).get.getDouble(1) == 0.0, "empty → 0.0")
  }

  test("NULL element poisons the product like zip_with does") {
    val df = Seq((1L, Seq[java.lang.Double](1.0, null, 3.0),
      Seq[java.lang.Double](1.0, 1.0, 1.0))).toDF("id", "a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("native"),
        Similarity.dotComposed(col("a"), col("b")).as("composed"))
    val r = df.collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("SQL registration: non-array input fails analysis") {
    GraftFunctions.register(spark)
    Seq((1.0, 2.0)).toDF("x", "y").createOrReplaceTempView("dp_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT dot_product(x, y) FROM dp_bad").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
