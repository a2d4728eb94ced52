package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{OrcCodec, OrcRle, OrcSim}

/** d133: the from-scratch ORC walker/writer. RLEv2 pins (all four
  * sub-encodings both directions, strict tiling), writer→reader
  * identity per codec, damage classes, and the interop pin BOTH
  * directions against Spark's own orc-core: real Spark files — every
  * codec, dictionary strings, orc-core's own RLEv2 choices — walk
  * through our reader with the stats audit ON, and our writer's files
  * read back row-identical through spark.read.orc. */
class OrcStripesSpec extends AnyFunSuite {

  private def rt(vs: Array[Long], signed: Boolean, label: String): Unit = {
    val enc = OrcRle.encode(vs, signed)
    val dec = OrcRle.decode(enc, signed, vs.length)
    assert(dec.sameElements(vs), s"$label: RLEv2 roundtrip mismatch")
  }

  test("RLEv2 roundtrips: every sub-encoding, signed/unsigned, boundaries") {
    val rnd = new java.util.Random(42)
    rt(Array.fill(7)(42L), signed = true, "short repeat")
    rt(Array.fill(700)(-3L), signed = true, "repeat chain past the 10-cap")
    rt((0 until 600).map(j => 100L + j).toArray, signed = true, "fixed delta, 512-run split")
    rt((0 until 20).map(j => j.toLong * j).toArray, signed = true, "ascending packed delta")
    rt((0 until 20).map(j => 1000L - j.toLong * j).toArray, signed = true, "descending packed delta")
    rt(Array.fill(100)(rnd.nextLong()), signed = true, "random 64-bit direct")
    rt(Array.fill(100)((rnd.nextInt(1000) - 500).toLong), signed = true, "random signed direct")
    rt(Array.fill(100)(rnd.nextInt(255).toLong), signed = false, "unsigned direct")
    rt(Array(7L), signed = true, "single value")
    rt(Array(7L, 9L), signed = true, "two values")
  }

  test("RLEv2 PATCHED_BASE: outlier windows pick it and roundtrip (positive and negative bases)") {
    val pb = (0 until 40).map(j =>
      if (j % 17 == 0) (1L << 40) + j else j.toLong % 100).toArray
    val enc = OrcRle.encode(pb, signed = true)
    assert((enc(0) & 0xff) >>> 6 == 2, "outlier window must pick PATCHED_BASE")
    rt(pb, signed = true, "patched base")
    rt((0 until 40).map(j => if (j == 5) 1L << 33 else -50L + j).toArray,
      signed = true, "patched base, negative base")
    rt((0 until 3).map(j => if (j == 0) 1L << 40 else j.toLong).toArray,
      signed = true, "patched base, 3-value stripe shape")
  }

  test("RLEv2 strictness: spare bytes and short streams quarantine") {
    val good = OrcRle.encode(Array(1L, 5L, 9L, 2L), signed = true)
    assertThrows[Throwable](OrcRle.decode(good :+ 0.toByte, signed = true, 4))
    assertThrows[Throwable](OrcRle.decode(good, signed = true, 5))
    assertThrows[Throwable](OrcRle.decode(good.dropRight(1), signed = true, 4))
  }

  test("writer -> reader identity: all four codecs, multi-stripe, the audit passing") {
    val text = "The five boxing wizards jump quickly. πéü𝄞 done. " * 6
    for (docId <- Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 11L, 13L)) {
      val rows = OrcSim.rowsFor(docId, text)
      val got = OrcCodec.read(OrcCodec.write(rows, 3, OrcSim.codecFor(docId)))
      assert(got.nStripes == (rows.size + 2) / 3, s"doc $docId stripe count")
      assert(got.rows == rows.toVector, s"doc $docId rows")
    }
  }

  test("damage classes: truncation, the lying footer max, the lying stream length all quarantine") {
    val text = "alpha beta gamma delta epsilon zeta eta theta " * 8
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L))
      assert(OrcCodec.read(OrcSim.payloadFor(docId, text)).rows.size ==
        OrcSim.kRows(docId))
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L))
      assertThrows[Throwable](OrcCodec.read(OrcSim.payloadFor(docId, text)))
  }

  test("interop 1: spark.read.orc reads our writer's files row-identical, every codec") {
    val spark = SparkTestSession.get
    val text = "Pack my box with five dozen liquor jugs πéü𝄞. " * 5
    for (docId <- Seq(0L, 1L, 2L, 3L)) {
      val rows = OrcSim.rowsFor(docId, text)
      val bytes = OrcCodec.write(rows, 3, OrcSim.codecFor(docId))
      val dir = SparkTestSession.tmpDir(s"orc133-ours-$docId")
      java.nio.file.Files.write(dir.resolve("part-0.orc"), bytes)
      val got = spark.read.orc(dir.toString).orderBy("id").collect()
      assert(got.length == rows.size, s"doc $docId row count")
      got.zip(rows).foreach { case (r, w) =>
        assert(r.getLong(0) == w.id && r.getLong(1) == w.v &&
          r.getLong(2) == w.tag && r.getString(3) == w.body,
          s"doc $docId codec ${OrcSim.codecFor(docId)}: $r vs $w")
      }
    }
  }

  test("interop 2: our reader walks REAL Spark files with the audit ON — every codec + dictionary strings") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val n = 2000
    val df = (0 until n).map { j =>
      (j.toLong * 3, (j * 13 % 50).toLong, (j % 3).toLong,
        if (j % 2 == 0) s"body-$j-" + ("x" * (j % 23)) else "dup-dup-dup")
    }.toDF("id", "val", "tag", "body")
    for (codec <- Seq("none", "zlib", "snappy", "zstd")) {
      val dir = SparkTestSession.tmpDir(s"orc133-$codec").toFile
      df.coalesce(1).write.option("compression", codec)
        .mode("overwrite").orc(dir.toString)
      val f = dir.listFiles().filter(_.getName.endsWith(".orc")).head
      val data = OrcCodec.read(java.nio.file.Files.readAllBytes(f.toPath))
      assert(data.rows.length == n, s"$codec: quarantined a real Spark file")
      data.rows.sortBy(_.id).zipWithIndex.foreach { case (r, j) =>
        val want = if (j % 2 == 0) s"body-$j-" + ("x" * (j % 23)) else "dup-dup-dup"
        assert(r.id == j.toLong * 3 && r.v == j * 13 % 50 &&
          r.tag == j % 3 && r.body == want, s"$codec row $j: $r")
      }
    }
    // low-cardinality strings make orc-core pick DICTIONARY_V2
    val df2 = (0 until 5000).map(j => (j.toLong, 0L, 0L, s"cat-${j % 7}"))
      .toDF("id", "val", "tag", "body")
    val dir2 = SparkTestSession.tmpDir("orc133-dict").toFile
    df2.coalesce(1).write.option("compression", "zlib").mode("overwrite")
      .orc(dir2.toString)
    val f2 = dir2.listFiles().filter(_.getName.endsWith(".orc")).head
    val d2 = OrcCodec.read(java.nio.file.Files.readAllBytes(f2.toPath))
    assert(d2.rows.length == 5000)
    d2.rows.sortBy(_.id).zipWithIndex.foreach { case (r, j) =>
      assert(r.body == s"cat-${j % 7}", s"dictionary row $j: ${r.body}")
    }
  }
}
