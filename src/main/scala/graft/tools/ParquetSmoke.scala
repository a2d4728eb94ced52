// Dev harness for the d126 codec: our write→read roundtrip across all
// four page codecs, the damage modes, and the Spark (parquet-mr)
// interop BOTH directions — real dictionary encoding, real page
// splits, real footers. Run:
//   java -cp target/scala-2.13/classes:/opt/spark/jars/\* graft.tools.ParquetSmoke
package graft.tools

object ParquetSmoke {
  def main(args: Array[String]): Unit = {
    import graft.operators.ParquetFile
    var fails = 0
    def fail(msg: String): Unit = { fails += 1; println(s"FAIL $msg") }

    def rowsFor(n: Int, seed: Long): Seq[(Long, Long, String)] =
      (0 until n).map(j => (seed * 1000 + j, (seed * 7 + j * 13) % 5,
        s"text body $seed/$j " + ("x" * (j % 17))))

    // 1. our write → our read, every codec, multi-row-group
    for (codec <- Seq(0, 1, 2, 6); n <- Seq(1, 2, 5, 23); cut <- Seq(1, 2, 7)) {
      val rows = rowsFor(n, 42)
      val bytes = ParquetFile.write(rows, cut, codec)
      ParquetFile.read(bytes) match {
        case Some(info) =>
          val wantGroups = (n + cut - 1) / cut
          if (info.numRows != n || info.nRowGroups != wantGroups)
            fail(s"codec$codec n$n cut$cut: rows/groups ${info.numRows}/${info.nRowGroups}")
          val ids = info.cols.find(_.path == "doc_id").get
          if (ids.sumInt != rows.map(_._1).sum)
            fail(s"codec$codec n$n cut$cut: id sum ${ids.sumInt}")
          val txt = info.cols.find(_.path == "text").get
          if (txt.byteLen != rows.map(_._3.getBytes("UTF-8").length.toLong).sum)
            fail(s"codec$codec n$n cut$cut: text bytes ${txt.byteLen}")
        case None => fail(s"codec$codec n$n cut$cut: quarantined")
      }
    }

    // 2. damage: lying stats, lying num_values, truncation, magic stomp
    val rows = rowsFor(7, 9)
    if (ParquetFile.read(ParquetFile.write(rows, 2, 1, lieStats = true)).nonEmpty)
      fail("lying max_value decoded")
    if (ParquetFile.read(ParquetFile.write(rows, 2, 1, lieNumValues = true)).nonEmpty)
      fail("lying num_values decoded")
    val clean = ParquetFile.write(rows, 2, 1)
    for (k <- Seq(1, 4, 5, clean.length / 2)) {
      if (ParquetFile.read(java.util.Arrays.copyOf(clean, clean.length - k)).nonEmpty)
        fail(s"truncation by $k decoded")
    }
    val stomp = clean.clone(); stomp(0) = 'X'
    if (ParquetFile.read(stomp).nonEmpty) fail("stomped magic decoded")

    // 3. Spark interop both directions
    val spark = graft.Tables.session("parquet-smoke", "4")
    try {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("pq126").toFile
      val df = rowsFor(200, 7).toDF("doc_id", "val", "text")
      for (codec <- Seq("uncompressed", "snappy", "gzip", "zstd")) {
        val p = new java.io.File(dir, s"spark-$codec")
        df.coalesce(1).write.option("compression", codec)
          .mode("overwrite").parquet(p.toString)
        val f = p.listFiles().filter(_.getName.endsWith(".parquet")).head
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        ParquetFile.read(bytes) match {
          case Some(info) =>
            if (info.numRows != 200) fail(s"spark $codec: rows ${info.numRows}")
            val ids = info.cols.find(_.path == "doc_id").get
            if (ids.sumInt != rowsFor(200, 7).map(_._1).sum)
              fail(s"spark $codec: id sum ${ids.sumInt} (audit or decode bug)")
            val vs = info.cols.find(_.path == "val").get
            if (vs.sumInt != rowsFor(200, 7).map(_._2).sum)
              fail(s"spark $codec: val sum ${vs.sumInt}")
          case None => fail(s"spark $codec: our walker quarantined a REAL Spark file")
        }
      }
      // our writer → spark.read
      for (codec <- Seq(0, 1, 2, 6)) {
        val p = new java.io.File(dir, s"ours-$codec/part-0.parquet")
        p.getParentFile.mkdirs()
        java.nio.file.Files.write(p.toPath,
          ParquetFile.write(rowsFor(50, 3), 7, codec))
        val got = spark.read.parquet(p.getParent)
          .orderBy("doc_id").collect()
        val want = rowsFor(50, 3).sortBy(_._1)
        if (got.length != 50 ||
            !got.zip(want).forall { case (r, w) =>
              r.getLong(0) == w._1 && r.getLong(1) == w._2 &&
                r.getString(2) == w._3 })
          fail(s"ours codec$codec: spark.read mismatch (${got.length} rows)")
      }
    } finally spark.stop()

    println(if (fails == 0) "ALL OK" else s"$fails FAILURES")
    if (fails > 0) sys.exit(1)
  }
}
