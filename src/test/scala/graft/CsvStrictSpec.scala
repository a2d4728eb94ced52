package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** d151: strict RFC 4180 — the grammar, the ragged-row and bare-quote
  * rules, damage classes, and interop both directions against Spark's
  * own CSV stack. */
class CsvStrictSpec extends AnyFunSuite {

  test("roundtrip: quoting survives encode∘decode") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val want = CsvSim.rowsFor(docId)
      val got = CsvCodec.decode(CsvCodec.encode(want))
        .getOrElse(fail(s"doc $docId quarantined"))
      assert(got == want)
    }
    // CRLF records parse too
    assert(CsvCodec.decode("a,b\r\nc,d\r\n".getBytes("UTF-8"))
      .contains(Seq(Seq("a", "b"), Seq("c", "d"))))
    // no trailing newline after the last record is legal
    assert(CsvCodec.decode("a,b\nc,d".getBytes("UTF-8"))
      .contains(Seq(Seq("a", "b"), Seq("c", "d"))))
  }

  test("damage classes: truncation, the bare quote, the ragged row") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L))
      assert(CsvCodec.decode(CsvSim.payloadFor(docId)).isEmpty,
        s"doc $docId should quarantine")
  }

  test("grammar: quote discipline enforced") {
    for (bad <- Seq(
      "a,b\"c,d\n", // bare quote mid unquoted field
      "\"ab,c\n", // unterminated quote
      "\"ab\"x,c\n", // closing quote not followed by separator
      "a,b\nc\n", // ragged
      "a,b\rc,d\n")) // CR without LF
      assert(CsvCodec.decode(bad.getBytes("UTF-8")).isEmpty, bad)
    assert(CsvCodec.decode("\"a\"\"b\",c\n".getBytes("UTF-8"))
      .contains(Seq(Seq("a\"b", "c"))))
    assert(CsvCodec.decode("\"x\ny\",z\n".getBytes("UTF-8"))
      .contains(Seq(Seq("x\ny", "z"))))
  }

  test("interop: spark.read.csv reads our shards and we read spark.write.csv") {
    val spark = SparkTestSession.get
    import scala.jdk.CollectionConverters._
    val dir = SparkTestSession.tmpDir("graft151").toFile
    dir.deleteOnExit()
    // direction 1: our bytes -> spark (multiLine for embedded newlines)
    val rows = CsvSim.rowsFor(6L)
    val f = new java.io.File(dir, "ours.csv")
    java.nio.file.Files.write(f.toPath, CsvCodec.encode(rows))
    // Spark's DEFAULT escape is backslash, not RFC 4180's doubled
    // quote; escape = quote is the documented recipe that makes the
    // univocity parser speak the RFC
    val sparkRead = spark.read
      .option("multiLine", "true").option("header", "false")
      .option("escape", "\"")
      .csv(f.getAbsolutePath)
      .collect()
      .map(r => (0 until 4).map(i => Option(r.getString(i)).getOrElse("")))
      .toSeq
    assert(sparkRead.toSet == rows.map(_.map(_.toString)).toSet,
      "spark must read our shard row-identical")
    // direction 2: spark.write.csv (univocity quoting) -> our decoder
    val df = spark.createDataFrame(Seq(
      ("a,b", "plain", "with \"quotes\""),
      ("line\nbreak", "x", "y")).map(t => org.apache.spark.sql.Row(t._1, t._2, t._3)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.StringType))))
    val outDir = new java.io.File(dir, "sparkout")
    df.coalesce(1).write.option("escape", "\"").csv(outDir.getAbsolutePath)
    val part = outDir.listFiles().filter(_.getName.endsWith(".csv")).head
    val got = CsvCodec.decode(java.nio.file.Files.readAllBytes(part.toPath))
      .getOrElse(fail("spark.write.csv output quarantined"))
    assert(got.toSet == Set(Seq("a,b", "plain", "with \"quotes\""),
      Seq("line\nbreak", "x", "y")))
  }
}
