package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BloomContainsExpr, BloomFilterAgg}
import graft.operators.Dedup

/** The Bloom-filter incremental-dedup contracts: NO false negatives
  * (the property the exact-verification join relies on), false
  * positives bounded near fpp, lossless partial-filter merge (the
  * 1000-executor property), strict analysis-time arity, and the
  * end-to-end [[Dedup.bloomIncremental]] flags agreeing with an exact
  * recomputation. */
class BloomFnsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"
  lazy val docs = Tables.load(spark, dir, "documents").select("doc_id", "text").cache()

  private def buildFilter(df: org.apache.spark.sql.DataFrame, fpp: Double): Array[Byte] =
    df.agg(BloomFilterAgg.column(xxhash64(col("text")), lit(10000L), lit(fpp)).as("bf"))
      .head.getAs[Array[Byte]]("bf")

  test("no false negatives: every inserted item probes true") {
    val bytes = buildFilter(docs, 0.01)
    val misses = docs.filter(
      !BloomContainsExpr.column(xxhash64(col("text")), lit(bytes))).count()
    assert(misses == 0)
  }

  test("false positive rate is near fpp on novel items") {
    val bytes = buildFilter(docs, 0.01)
    val novel = spark.range(100000, 102000)
      .select(concat(lit("never-seen-"), col("id").cast("string")).as("text"))
    val fp = novel.filter(
      BloomContainsExpr.column(xxhash64(col("text")), lit(bytes))).count()
    // fpp=1% over 2000 probes → expect ~20; allow generous 5× headroom
    assert(fp <= 100, s"false positives $fp / 2000 way above fpp")
  }

  test("partial filters merge losslessly: partitioned build == single build") {
    // the aggregate ORs per-partition filters together; the merged
    // filter must still contain every item regardless of partitioning
    val bytes = buildFilter(docs.repartition(13), 0.01)
    val misses = docs.filter(
      !BloomContainsExpr.column(xxhash64(col("text")), lit(bytes))).count()
    assert(misses == 0)
  }

  test("bloom_contains rejects a non-foldable filter at analysis time") {
    val bytes = buildFilter(docs, 0.01)
    val withCol = docs.withColumn("bf", lit(bytes))
    val ex = intercept[AnalysisException] {
      withCol.select(BloomContainsExpr.column(
        xxhash64(col("text")), col("bf"))).collect()
    }
    assert(ex.getMessage.contains("foldable"))
  }

  test("bloom_agg rejects non-literal or invalid sizing args at analysis time") {
    intercept[AnalysisException] {
      docs.agg(BloomFilterAgg.column(
        xxhash64(col("text")), col("doc_id"), lit(0.01))).collect()
    }
    intercept[AnalysisException] {
      docs.agg(BloomFilterAgg.column(
        xxhash64(col("text")), lit(100L), lit(1.5))).collect()
    }
  }

  test("SQL surface: bloom_agg + bloom_contains round-trip") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("bloom_docs")
    val bytes = spark.sql(
      "SELECT bloom_agg(xxhash64(text), 10000L, 0.01D) FROM bloom_docs")
      .head.getAs[Array[Byte]](0)
    spark.sql("DROP VIEW bloom_docs")
    val hit = docs.limit(1)
      .select(BloomContainsExpr.column(xxhash64(col("text")), lit(bytes)))
      .head.getBoolean(0)
    assert(hit)
  }

  test("bloomIncremental flags agree with exact recomputation") {
    val copies = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    val novel = docs.filter(col("doc_id") % 7 === 3)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit(" fresh"), col("doc_id").cast("string")).as("text"))
    val batch = copies.unionByName(novel)
    val flags = Dedup.bloomIncremental(docs, batch, col("text"), col("doc_id"))
    // exact truth: copies are dups, novels are not (novel text can't
    // collide — the suffix isn't in any source doc)
    val got = flags.select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(got.size == batch.count())
    got.foreach { case (id, isDup) =>
      assert(isDup == (id < 3000000L), s"doc $id flagged $isDup")
    }
    // no false negatives among dups
    assert(flags.filter(col("is_dup") && !col("bloom_hit")).count() == 0)
  }

  test("bloomIncremental rejects an empty history with a clear message") {
    val empty = docs.filter(lit(false))
    val e = intercept[IllegalArgumentException] {
      Dedup.bloomIncremental(empty, docs, col("text"), col("doc_id"))
    }
    assert(e.getMessage.contains("non-empty history"), e.getMessage)
  }
}
