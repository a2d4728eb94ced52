package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._
import graft.operators.DeltaJson._

/** d141: the Delta transaction-log replay — the strict JSON grammar,
  * the protocol rules, reconciliation, the read-back stats audit, and
  * the three damage classes. */
class DeltaLogSpec extends AnyFunSuite {

  test("strict JSON: escapes, nesting, numbers; garbage rejected") {
    assert(parse("""{"a":1,"b":[true,null,-2.5e3],"c":"x\n€\""}""") ==
      JObj(Map("a" -> JNum(1), "b" -> JArr(Seq(JBool(true), JNull,
        JDbl(-2500.0))), "c" -> JStr("x\n€\""))))
    assert(parse("\"\\u0041\\u00e9\"") == JStr("Aé"))
    assert(parse("0") == JNum(0))
    // stats-in-a-string: JSON nested INSIDE a JSON string (the Delta shape)
    val nested = parse("""{"stats":"{\"numRecords\":4}"}""") match {
      case JObj(m) => m("stats") match {
        case JStr(s) => parse(s)
        case _ => fail()
      }
      case _ => fail()
    }
    assert(nested == JObj(Map("numRecords" -> JNum(4))))
    for (bad <- Seq("{", """{"a":1,"a":2}""", """{"a":1} x""", "01",
      "1.", """"\q"""", "\"raw\nnewline\"", "tru", "[1,]", """{"a":}""",
      "", "NaN"))
      assertThrows[Throwable](parse(bad))
  }

  test("our parser agrees with json4s on every action line the sim writes") {
    import org.json4s.{JValue, JObject, JArray, JString, JInt, JDouble, JLong, JNothing}
    def toJ(v: JVal): JValue = v match {
      case JObj(m) => JObject(m.toList.map { case (k, x) => k -> toJ(x) })
      case JArr(xs) => JArray(xs.map(toJ).toList)
      case JStr(s) => JString(s)
      case JNum(n) => JInt(BigInt(n))
      case JDbl(d) => JDouble(d)
      case DeltaJson.JBool(b) => org.json4s.JBool(b)
      case DeltaJson.JNull => JNothing // normalized below on both sides
    }
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L)) {
      val (commits, _) = DeltaLogSim.tableFor(docId)
      commits.flatMap(_._2.split("\n")).foreach { line =>
        val ours = toJ(parse(line))
        val theirs = org.json4s.jackson.JsonMethods.parse(line,
          useBigDecimalForDouble = false, useBigIntForLong = false)
        def norm(j: JValue): JValue = j match {
          case JObject(fs) => JObject(fs.map { case (k, x) => k -> norm(x) })
          case JArray(xs) => JArray(xs.map(norm))
          case org.json4s.JNull => JNothing
          case JLong(n) => JInt(BigInt(n))
          case other => other
        }
        assert(norm(ours) == norm(theirs), s"doc $docId line: $line")
      }
    }
  }

  test("clean docs replay to the closed-form snapshot, latest-add-wins exercised") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val (commits, files) = DeltaLogSim.tableFor(docId)
      val snap = DeltaLog.replay(commits)
      val odd = docId % 2 == 1
      assert(snap.nVersions == (if (odd) 3 else 2))
      val expectLive =
        if (odd) Set("f0.parquet", "f2.parquet", "f3.parquet")
        else Set("f0.parquet", "f2.parquet")
      assert(snap.live.map(_.path).toSet == expectLive)
      // the stats audit passes against the real files
      snap.live.foreach { a =>
        val info = ParquetFile.read(files(a.path)).get
        assert(info.numRows == a.numRecords)
        val v = info.cols.find(_.path == "val").get
        assert(v.minInt == a.minVal && v.maxInt == a.maxVal)
      }
    }
  }

  test("damage classes: the version gap, the lying numRecords, the dangling remove") {
    for (docId <- Seq(0L, 7L, 14L, 5L, 12L, 19L)) {
      val (commits, _) = DeltaLogSim.tableFor(docId)
      assertThrows[Throwable](DeltaLog.replay(commits))
    }
    // the lying numRecords replays fine — only the READ-BACK audit
    // catches it (the lie lives in stats, not the log structure)
    for (docId <- Seq(3L, 10L, 17L)) {
      val (commits, files) = DeltaLogSim.tableFor(docId)
      val snap = DeltaLog.replay(commits)
      val f2 = snap.live.find(_.path == "f2.parquet").get
      val info = ParquetFile.read(files("f2.parquet")).get
      assert(info.numRows != f2.numRecords, "the lie must be audible")
    }
  }

  test("protocol rules: future minReaderVersion, non-parquet provider, unknown actions refuse") {
    val meta = """{"metaData":{"id":"t","format":{"provider":"parquet"},""" +
      """"schemaString":"s","partitionColumns":[]}}"""
    def v0(protocol: String, extra: String = ""): Seq[(Long, String)] =
      Seq(0L -> (Seq(protocol, meta) ++
        (if (extra.nonEmpty) Seq(extra) else Nil)).mkString("\n"))
    assertThrows[Throwable](DeltaLog.replay(
      v0("""{"protocol":{"minReaderVersion":2}}""")))
    assertThrows[Throwable](DeltaLog.replay(Seq(0L ->
      Seq("""{"protocol":{"minReaderVersion":1}}""",
        """{"metaData":{"id":"t","format":{"provider":"orc"},"schemaString":"s"}}""")
        .mkString("\n"))))
    assertThrows[Throwable](DeltaLog.replay(
      v0("""{"protocol":{"minReaderVersion":1}}""",
        """{"mystery":{"x":1}}""")))
    // missing protocol/metaData at v0
    assertThrows[Throwable](DeltaLog.replay(Seq(0L -> meta)))
    // v0 alone with both is a valid (empty) table
    assert(DeltaLog.replay(
      v0("""{"protocol":{"minReaderVersion":1}}""")).live.isEmpty)
  }
}

/** d173: the checkpoint replay — state reconstruction, the audits,
  * and the latest-wins-over-checkpoint rule. */
class DeltaCheckpointSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators.{DeltaCheckpoint, DeltaCkptSim, ParquetFile}

  test("clean docs replay checkpoint + commits to the closed-form live set") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val (lc, ck, commits, files) = DeltaCkptSim.tableFor(docId)
      val rows = ParquetFile.readRows(ck).getOrElse(fail("checkpoint refused"))
      assert(rows.length == 6)
      val (ver, snap) = DeltaCheckpoint.replay(lc, rows, commits)
      assert(ver == 2L)
      assert(snap.nVersions == (2 + docId % 2).toInt)
      assert(snap.live.map(_.path).toSet ==
        Set("f0.parquet", "f2.parquet", "f4.parquet"))
      snap.live.foreach(a => assert(files.contains(a.path)))
    }
  }

  test("readRows returns the exact rows the writer put in (audit layered under)") {
    val want = Seq((1L, 5L, "alpha"), (2L, 9L, "beta é"), (3L, 0L, ""))
    for (codec <- Seq(0, 1, 2, 6)) {
      val bytes = ParquetFile.write(want, rowGroupCut = 2, codec)
      assert(ParquetFile.readRows(bytes).contains(want))
    }
    // a damaged file refuses at the audit layer before value extraction
    val bad = ParquetFile.write(want, 2, 0, lieStats = true)
    assert(ParquetFile.readRows(bad).isEmpty)
  }

  test("damage classes: sidecar size lie, checkpoint stats lie, dangling remove") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L)) {
      val (lc, ck, commits, _) = DeltaCkptSim.tableFor(docId)
      val quarantined = ParquetFile.readRows(ck) match {
        case None => true
        case Some(rows) =>
          try {
            val (_, snap) = DeltaCheckpoint.replay(lc, rows, commits)
            // the %7==3 stats lie survives replay and is caught at the
            // read-back audit — mirror the gate's check here
            val files = DeltaCkptSim.tableFor(docId)._4
            snap.live.exists { a =>
              val info = ParquetFile.read(files(a.path))
              info.isEmpty || info.get.numRows != a.numRecords
            }
          } catch { case _: Throwable => true }
      }
      assert(quarantined, s"doc $docId must quarantine somewhere in the chain")
    }
  }

  test("checkpoint state contradictions refuse: dup add, tombstoned add, bad code") {
    val (lc, ck, commits, _) = DeltaCkptSim.tableFor(1L)
    val rows = ParquetFile.readRows(ck).get
    // duplicate add path inside one state
    val dup = rows :+ (6L, 2L, rows.find(_._2 == 2L).get._3)
    assertThrows[Throwable](DeltaCheckpoint.replay(
      """{"version":2,"size":7}""", dup, commits))
    // a mislabeled type code
    val mislabeled = rows.updated(2, (rows(2)._1, 3L, rows(2)._3))
    assertThrows[Throwable](DeltaCheckpoint.replay(lc, mislabeled, commits))
    // a tombstone for a path that is also live in the same state
    val contradiction = rows.updated(5,
      (5L, 3L, """{"remove":{"path":"f0.parquet","deletionTimestamp":1,"dataChange":true}}"""))
    assertThrows[Throwable](DeltaCheckpoint.replay(lc, contradiction, commits))
    // non-contiguous commit versions after the checkpoint
    assertThrows[Throwable](DeltaCheckpoint.replay(lc, rows,
      commits.map { case (v, c) => (v + 1, c) }))
  }
}
