package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ParquetFile

/** The d126 interop pin, BOTH directions against Spark's own parquet
  * (parquet-mr): real Spark files — REQUIRED and OPTIONAL columns,
  * dictionary encoding, real page splits, all four codecs — walk
  * through our from-scratch reader with the stats audit passing; our
  * writer's files read back row-identical through spark.read.parquet.
  * (ParquetSmoke is the wider dev sweep; this is the committed pin.) */
class ParquetInteropSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.get

  private def rowsFor(n: Int, seed: Long): Seq[(Long, Long, String)] =
    (0 until n).map(j => (seed * 1000 + j, (seed * 7 + j * 13) % 5,
      s"text body $seed/$j " + ("x" * (j % 17))))

  test("our walker reads REAL Spark files: every codec, dictionary pages, audit ON") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pq126spec").toFile
    // tuple-derived schema: REQUIRED longs + OPTIONAL string — both
    // definition-level paths; val is low-cardinality → dictionary
    val rows = rowsFor(300, 7)
    val df = rows.toDF("doc_id", "val", "text")
    for (codec <- Seq("uncompressed", "snappy", "gzip", "zstd")) {
      val p = new java.io.File(dir, s"spark-$codec")
      df.coalesce(1).write.option("compression", codec)
        .mode("overwrite").parquet(p.toString)
      val f = p.listFiles().filter(_.getName.endsWith(".parquet")).head
      val info = ParquetFile.read(java.nio.file.Files.readAllBytes(f.toPath))
      assert(info.nonEmpty, s"$codec: quarantined a real Spark file")
      assert(info.get.numRows == 300)
      assert(info.get.cols.find(_.path == "doc_id").get.sumInt ==
        rows.map(_._1).sum, s"$codec: doc_id sum")
      assert(info.get.cols.find(_.path == "val").get.sumInt ==
        rows.map(_._2).sum, s"$codec: val sum (dictionary decode)")
      assert(info.get.cols.find(_.path == "text").get.byteLen ==
        rows.map(_._3.getBytes("UTF-8").length.toLong).sum, s"$codec: text bytes")
    }
  }

  test("Spark reads our writer's files row-identical: every codec") {
    val dir = java.nio.file.Files.createTempDirectory("pq126spec2").toFile
    for (codec <- Seq(0, 1, 2, 6)) {
      val p = new java.io.File(dir, s"ours-$codec/part-0.parquet")
      p.getParentFile.mkdirs()
      val want = rowsFor(50, 3).sortBy(_._1)
      java.nio.file.Files.write(p.toPath, ParquetFile.write(want, 7, codec))
      val got = spark.read.parquet(p.getParent).orderBy("doc_id").collect()
      assert(got.length == 50, s"codec $codec: row count")
      got.zip(want).foreach { case (r, w) =>
        assert(r.getLong(0) == w._1 && r.getLong(1) == w._2 &&
          r.getString(2) == w._3, s"codec $codec: row mismatch")
      }
    }
  }
}
