package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.PolyTokenHashExpr

/** The fused native poly-token-hash expression must be bit-identical
  * to the composed Column form it replaced — every oracle-exact dedup
  * operator (d23/d24/d27/d34/d39) and the generated DuckDB oracle SQL
  * both derive from this recurrence, so any divergence breaks the
  * cross-engine hash gate. */
class PolyTokenHashSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  /** the original composed form: one array alloc per character */
  private def composed(text: Column): Column =
    transform(split(lower(text), "\\s+"), w =>
      aggregate(split(w, ""), lit(0L),
        (acc, c) => pmod(acc * 31L + coalesce(ascii(c), lit(0)), lit(2147483647L))))

  test("fused expression equals the composed form on the corpus") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val diff = docs.select(
      PolyTokenHashExpr.column(col("text")).as("fused"),
      composed(col("text")).as("comp"))
      .filter(col("fused") =!= col("comp")).count()
    assert(diff == 0)
  }

  test("edge cases: empties, leading/trailing/multiple whitespace, case, non-ascii") {
    val cases = Seq("", " ", "  ", "a", " a", "a ", "a  b", "A\tB\nc",
      "MiXeD CaSe", "héllo wörld", "tab\t\ttab", "7 numbers 42")
    val df = cases.toDF("text")
    val rows = df.select(col("text"),
      PolyTokenHashExpr.column(col("text")).as("fused"),
      composed(col("text")).as("comp")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"mismatch on '${r.getString(0)}': ${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}")
    }
  }

  test("null in, null out; non-string input rejected at analysis time") {
    val df = Seq[Option[String]](None, Some("x")).toDF("text")
    val got = df.select(PolyTokenHashExpr.column(col("text"))).collect()
    assert(got(0).isNullAt(0) && !got(1).isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("n").select(PolyTokenHashExpr.column(col("n"))).collect()
    }
  }

  test("SQL surface: poly_minhash_bands matches the Column API") {
    GraftFunctions.register(spark)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    docs.createOrReplaceTempView("pmb_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, poly_minhash_bands(text) AS b FROM pmb_docs")
    val viaCol = docs.select(col("doc_id"),
      graft.operators.Dedup.polyRowBands(col("text")).as("b"))
    assert(viaSql.exceptAll(viaCol).count() == 0 &&
      viaCol.exceptAll(viaSql).count() == 0)
    spark.sql("DROP VIEW pmb_docs")
  }
}
