package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ParquetFile, ParquetNestedSim}

/** d171: nested LIST columns (array<float>, repetition + definition
  * levels, v1 AND v2 pages) through the strict walk — closed-form
  * roundtrip, the damage grid, a full truncation sweep, scope
  * rejections, and interop BOTH directions against Spark's parquet-mr
  * (the layout embedding shards actually ship). */
class ParquetNestedSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.get

  test("roundtrip: clean docs replay the closed form (both page forms)") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val info = ParquetFile.read(ParquetNestedSim.payloadFor(docId))
        .getOrElse(fail(s"doc $docId quarantined"))
      val rows = ParquetNestedSim.rowsFor(docId)
      val e = info.cols.find(_.path == "emb.list.element").get
      assert(info.numRows == rows.length)
      assert(e.rows == rows.length, "rep-0 slots = rows")
      assert(e.nullLists == rows.count(_._2.isEmpty))
      assert(e.emptyLists == rows.count(r => r._2.exists(_.isEmpty)))
      val present = rows.flatMap(_._2.getOrElse(Nil)).flatten
      assert(e.numValues - e.nulls == present.length)
      assert(math.abs(e.sumF - present.map(_.toDouble).sum) == 0.0,
        "quarter-float sums are exact")
      assert(info.cols.find(_.path == "doc_id").get.sumInt ==
        rows.map(_._1).sum)
    }
  }

  test("damage grid: truncation, the lying float max, the lying row structure") {
    // %7==0 truncation, ==3 lying element max_value, ==5 the
    // structural num_rows/num_values lie — across BOTH page-form
    // parities (docId%2 picks v1/v2)
    for (docId <- Seq(0L, 7L, 14L, 21L, 3L, 10L, 17L, 24L, 5L, 12L, 19L, 26L))
      assert(ParquetFile.read(ParquetNestedSim.payloadFor(docId)).isEmpty,
        s"doc $docId should quarantine")
  }

  test("every truncation of a nested file quarantines or stays honest") {
    for (docId <- Seq(1L, 2L)) { // one v2, one v1
      val clean = ParquetNestedSim.payloadFor(docId)
      (1 until clean.length).foreach { keep =>
        assert(ParquetFile.read(
          java.util.Arrays.copyOf(clean, keep)).isEmpty,
          s"doc $docId truncated to $keep bytes must quarantine")
      }
    }
  }

  test("scope rejections: MAP-like group, deep nesting, bare repeated leaf") {
    // a Spark-written map<string,float> column must QUARANTINE (the
    // group lacks the LIST annotation / has two children) — out of
    // scope is a stated rule, never a guess
    import spark.implicits._
    val dir = SparkTestSession.tmpDir("pq171scope").toFile
    val p = new java.io.File(dir, "map")
    Seq((1L, Map("a" -> 1.0f)), (2L, Map("b" -> 2.0f)))
      .toDF("doc_id", "m").coalesce(1)
      .write.mode("overwrite").parquet(p.toString)
    val f = p.listFiles().filter(_.getName.endsWith(".parquet")).head
    assert(ParquetFile.read(java.nio.file.Files.readAllBytes(f.toPath)).isEmpty,
      "map columns are out of scope and must quarantine")
    // nested list-of-list: deeper than the 3-level scope
    val p2 = new java.io.File(dir, "nested2")
    Seq((1L, Seq(Seq(1.0f, 2.0f)))).toDF("doc_id", "ll").coalesce(1)
      .write.mode("overwrite").parquet(p2.toString)
    val f2 = p2.listFiles().filter(_.getName.endsWith(".parquet")).head
    assert(ParquetFile.read(java.nio.file.Files.readAllBytes(f2.toPath)).isEmpty,
      "list-of-list is out of scope and must quarantine")
  }

  test("interop 1: our walker reads REAL Spark array<float> files, audit ON") {
    import spark.implicits._
    val dir = SparkTestSession.tmpDir("pq171spark").toFile
    // the full ladder from Spark's side: null list, empty list,
    // null elements, values; floats dictionary-encode by default
    val rows: Seq[(Long, Option[Seq[Option[Float]]])] = (0 until 200).map { i =>
      (i.toLong, (i % 4) match {
        case 0 => None
        case 1 => Some(Seq.empty[Option[Float]])
        case 2 => Some((0 until 3).map(j => Some((i * 3 + j) / 4.0f): Option[Float]))
        case _ => Some(Seq(Some(i / 2.0f), None, Some(i / 4.0f)))
      })
    }
    val df = rows.toDF("doc_id", "emb")
    for (codec <- Seq("uncompressed", "snappy", "gzip", "zstd")) {
      val p = new java.io.File(dir, s"spark-$codec")
      df.coalesce(1).write.option("compression", codec)
        .mode("overwrite").parquet(p.toString)
      val f = p.listFiles().filter(_.getName.endsWith(".parquet")).head
      val info = ParquetFile.read(java.nio.file.Files.readAllBytes(f.toPath))
      assert(info.nonEmpty, s"$codec: quarantined a real Spark nested file")
      val e = info.get.cols.find(_.path.endsWith(".element"))
        .getOrElse(fail(s"$codec: no nested leaf found"))
      assert(e.rows == 200, s"$codec: rep-0 rows")
      assert(e.nullLists == rows.count(_._2.isEmpty), s"$codec: null lists")
      assert(e.emptyLists == rows.count(_._2.exists(_.isEmpty)), s"$codec: empty lists")
      val present = rows.flatMap(_._2.getOrElse(Nil)).flatten
      assert(e.numValues - e.nulls == present.length, s"$codec: n values")
      assert(e.sumF == present.map(_.toDouble).sum, s"$codec: exact float sum")
    }
  }

  test("interop 2: Spark reads our nested writer's files value-identical") {
    for ((codec, v2) <- Seq((0, false), (1, false), (2, true), (6, true))) {
      val dir = SparkTestSession.tmpDir(s"pq171ours$codec").toFile
      val p = new java.io.File(dir, "part-0.parquet")
      val want = ParquetNestedSim.rowsFor(4L)
      java.nio.file.Files.write(p.toPath,
        ParquetFile.writeNested(want, 2, codec, v2))
      val got = spark.read.parquet(dir.toString).orderBy("doc_id").collect()
      assert(got.length == want.length, s"codec $codec: rows")
      got.zip(want.sortBy(_._1)).foreach { case (r, w) =>
        assert(r.getLong(0) == w._1, s"codec $codec: id")
        val gotEmb = Option(r.getSeq[java.lang.Float](1))
          .map(_.map(Option(_).map(_.floatValue())))
        val wantEmb = w._2.map(_.map(identity))
        assert(gotEmb.map(_.toSeq) == wantEmb.map(_.toSeq),
          s"codec $codec: emb for id ${w._1}")
      }
    }
  }
}
