package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JsonlSource

/** JSONL shard source: lossless round-trip under the explicit schema,
  * and the quarantine contract — a malformed line must neither abort
  * the read nor surface as a half-parsed row. */
class JsonlSourceSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  val dir = "/root/testdata/sf0.001"

  test("documents round-trip through JSONL shards losslessly") {
    val docs = Tables.load(spark, dir, "documents")
    val out = SparkTestSession.tmpDir("graft-jsonl").toString + "/docs"
    JsonlSource.write(docs, out)
    val back = JsonlSource.readDocuments(spark, out)
    assert(back.count() == docs.count())
    assert(back.except(docs).count() == 0 && docs.except(back).count() == 0)
  }

  test("malformed shard lines are quarantined, not fatal and not half-parsed") {
    val tmp = SparkTestSession.tmpDir("graft-jsonl-bad")
    Files.write(Paths.get(tmp.toString, "shard.jsonl"), java.util.Arrays.asList(
      """{"doc_id": 1, "text": "good line", "lang": "en", "source": "s", "n_chars": 9}""",
      """{"doc_id": 2, "text": "truncated""",
      """not json at all""",
      """{"doc_id": 3, "text": "also good", "lang": "en", "source": "s", "n_chars": 9}"""))
    val clean = JsonlSource.readClean(spark, tmp.toString,
      JsonlSource.documentsSchema)
    assert(clean.count() == 2)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    val quarantined = JsonlSource.readQuarantine(spark, tmp.toString,
      JsonlSource.documentsSchema)
    assert(quarantined.count() == 2)
    assert(quarantined.collect().map(_.getString(0)).exists(_.contains("not json")))
  }
}
