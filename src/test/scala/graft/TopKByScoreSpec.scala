package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKByScore
import graft.operators.Similarity

/** The custom bounded-top-k aggregate must agree exactly with the
  * window-sort form, including tie handling. */
class TopKByScoreSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  test("agg form == window form on real embeddings") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 15)
    val a = Similarity.bruteForceTopK(e, q, 5)
    val b = Similarity.bruteForceTopKWindow(e, q, 5)
    assert(a.count() == b.count())
    assert(a.except(b).count() == 0)
    assert(b.except(a).count() == 0)
  }

  test("SQL callers get implicit casts (int score / int id)") {
    GraftFunctions.register(spark)
    Seq((1, 9, 10), (1, 5, 3)).toDF("g", "s", "id")
      .createOrReplaceTempView("topk_cast_test")
    val rows = spark.sql(
      "SELECT g, topk_by_score(s, id, 2) AS top FROM topk_cast_test GROUP BY g")
      .selectExpr("g", "inline(top)").collect()
    assert(rows.map(r => (r.getDouble(1), r.getLong(2))).toSeq ==
      Seq((9.0, 10L), (5.0, 3L)))
  }

  test("non-positive / non-foldable k fails analysis") {
    GraftFunctions.register(spark)
    Seq((1, 0.5, 3L)).toDF("g", "s", "id")
      .createOrReplaceTempView("topk_neg_test")
    val e1 = intercept[Exception] {
      spark.sql("SELECT topk_by_score(s, id, 0) FROM topk_neg_test GROUP BY g").collect()
    }
    assert(e1.getMessage.contains("k > 0") ||
      e1.getClass.getName.contains("Analysis"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT topk_by_score(s, id, id) FROM topk_neg_test GROUP BY g").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("foldable") ||
      e2.getClass.getName.contains("Analysis"), e2.getMessage)
    // NULL literal k is foldable and implicit-castable — must be a
    // clean analysis failure, not a planner MatchError
    val e3 = intercept[Exception] {
      spark.sql("SELECT topk_by_score(s, id, NULL) FROM topk_neg_test GROUP BY g").collect()
    }
    assert(!e3.getClass.getName.contains("MatchError"), e3.getClass.getName)
    assert(e3.getMessage.toLowerCase.contains("non-null") ||
      e3.getClass.getName.contains("Analysis"), e3.getMessage)
  }

  test("ties break by smaller id; nulls skipped; k bounds output") {
    val df = Seq(
      (1L, 0.9, 10L), (1L, 0.9, 3L), (1L, 0.9, 7L), (1L, 0.5, 1L),
      (2L, 0.1, 5L)).toDF("g", "s", "id")
      .union(Seq((2L, Option.empty[Double], Option(6L))).toDF("g", "s", "id"))
    val out = df.groupBy(col("g"))
      .agg(TopKByScore.column(col("s"), col("id"), lit(2)).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("pos"), col("t.score"), col("t.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, 0, 0.9, 3L), (1L, 1, 0.9, 7L),   // ties → smaller ids win
      (2L, 0, 0.1, 5L)))                     // null score row skipped
  }
}
