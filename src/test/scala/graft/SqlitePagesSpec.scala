package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{SqliteCodec, SqliteSim}
import graft.operators.SqliteCodec._

/** d132: the from-scratch SQLite walker/writer. Format-level pins
  * (varints incl. the 9-byte form, serial-type widths, the exact
  * leaf-spill K-vs-M branches, b-tree shape, damage classes) plus the
  * interop pin BOTH directions against the sqlite3 CLI — the
  * REFERENCE'S own storage engine: our files pass sqlite's own
  * `PRAGMA integrity_check` and SELECT back identical; CLI-written
  * multi-leaf/overflow databases walk through our decoder. */
class SqlitePagesSpec extends AnyFunSuite {

  private def roundtrip(tables: Seq[STable]): Seq[(Long, IndexedSeq[Any])] =
    SqliteCodec.readTable(SqliteCodec.write(tables).bytes, tables.head.name)

  test("varint roundtrip: 1..9 byte forms, boundaries, negatives") {
    val vals = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, (1L << 21) - 1,
      1L << 21, (1L << 28) - 1, 1L << 35, 1L << 42, 1L << 49, (1L << 56) - 1,
      1L << 56, Long.MaxValue, -1L, Long.MinValue)
    vals.foreach { v =>
      val b = writeVarint(v)
      assert(b.length >= 1 && b.length <= 9)
      if (v >= 0 && (v >>> 56) == 0)
        assert(b.length <= 8, s"$v should not need the 9-byte form")
      else assert(b.length == 9, s"$v needs the 9-byte form")
      val (got, n) = readVarint(b, 0, b.length)
      assert(got == v && n == b.length, s"varint $v -> $got/$n")
    }
  }

  test("record roundtrip: every serial-type width, floats, text, blob, nulls") {
    val ints = Seq(0L, 1L, 2L, -1L, 127L, -128L, 128L, 32767L, -32768L,
      32768L, 8388607L, -8388608L, (1L << 31) - 1, -(1L << 31), 1L << 40,
      (1L << 47) - 1, -(1L << 47), Long.MaxValue, Long.MinValue)
    val vals: Seq[SVal] = ints.map(SInt.apply) ++ Seq(
      SNull, SReal(0.5), SReal(-1234.25), SReal(Double.MaxValue),
      SText(""), SText("héllo π𝄞"), SBlob(Array[Byte](1, -2, 3)))
    val rec = encodeRecord(vals)
    val got = parseRecord(rec)
    assert(got.length == vals.length)
    vals.zip(got).foreach {
      case (SInt(v), g) => assert(g == v, s"int $v -> $g")
      case (SNull, g) => assert(g == null)
      case (SReal(d), g) => assert(g == d)
      case (SText(s), g) => assert(g == s)
      case (SBlob(b), g) =>
        assert(java.util.Arrays.equals(b, g.asInstanceOf[Array[Byte]]))
    }
  }

  test("leaf spill: inline / K-inline / M-inline branches all roundtrip") {
    // U=512: X=477, M=39. Payload sizes hitting each branch:
    //  - small (inline), P ~ X boundary both sides,
    //  - K <= X (spill with K inline), K > X (spill with M inline).
    val bodies = (400 to 1300 by 37) ++ Seq(455, 456, 457, 458, 459, 460)
    val rows = bodies.zipWithIndex.map { case (len, j) =>
      (j.toLong + 1, Seq[SVal](SNull, SInt(j.toLong), SText("b" * len)))
    }
    val t = STable("t", "CREATE TABLE t(id INTEGER PRIMARY KEY, j INTEGER, body TEXT)", rows)
    val got = roundtrip(Seq(t))
    assert(got.size == rows.size)
    got.zip(rows).foreach { case ((rowid, cols), (wantId, wantVals)) =>
      assert(rowid == wantId)
      assert(cols(1) == wantVals(1).asInstanceOf[SInt].v)
      assert(cols(2) == wantVals(2).asInstanceOf[SText].v)
    }
  }

  test("9-byte-varint rowids, interior pages, schema decoy selection") {
    val rows = (0 until 12).map { j =>
      (Long.MaxValue - 200 + j, Seq[SVal](SNull, SText(s"r$j" + "y" * 500)))
    }
    val t = STable("big", "CREATE TABLE big(id INTEGER PRIMARY KEY, body TEXT)", rows)
    val decoy = STable("decoy", "CREATE TABLE decoy(id INTEGER PRIMARY KEY, n TEXT)",
      Seq((1L, Seq[SVal](SNull, SText("x")))))
    val db = SqliteCodec.write(Seq(decoy, t)).bytes
    assert(SqliteCodec.tableNames(db).toSet == Set("decoy", "big"))
    val got = SqliteCodec.readTable(db, "big")
    assert(got.size == 12)
    assert(got.map(_._1) == rows.map(_._1))
    assert(got.forall { case (rid, cols) =>
      cols(1) == s"r${(rid - (Long.MaxValue - 200)).toInt}" + "y" * 500 })
  }

  test("damage classes: truncation and bad cell pointer quarantine; the type lie trips the schema discipline") {
    val text = "alpha beta gamma delta epsilon zeta eta theta " * 8
    for (id <- Seq(0L, 7L, 3L, 10L)) {
      val db = SqliteSim.payloadFor(id, text)
      assertThrows[Throwable](SqliteCodec.readTable(db, "docs"))
    }
    for (id <- Seq(5L, 12L)) {
      val rows = SqliteCodec.readTable(SqliteSim.payloadFor(id, text), "docs")
      assert(rows.head._2(4).isInstanceOf[Array[Byte]],
        "type lie: body must come back blob, not text")
      assert(rows.tail.forall(_._2(4).isInstanceOf[String]))
    }
    // bit-flip robustness: flips across the header/b-tree region either
    // quarantine or leave the walked rows identical (record bytes in the
    // content area CAN legally change values — only structure is pinned)
    val clean = SqliteSim.payloadFor(1L, text)
    val want = SqliteCodec.readTable(clean, "docs")
    for (bit <- 0 until 200) {
      val mut = clean.clone()
      mut(bit / 8) = (mut(bit / 8) ^ (1 << (bit % 8))).toByte
      try {
        val got = SqliteCodec.readTable(mut, "docs")
        // a surviving flip in the header region must not change rows
        assert(got.map(_._1) == want.map(_._1), s"bit $bit changed rowids silently")
      } catch { case _: Throwable => () }
    }
  }

  test("the sim row source matches the closed-form grid (gate shape)") {
    val spark = SparkTestSession.get
    import spark.implicits._
    val docsDf = Seq(
      (1L, "one two three four five six seven eight nine ten " * 4),
      (2L, "lorem ipsum dolor sit amet consectetur adipiscing " * 3),
      (3L, "damaged pointer doc"), (7L, "truncated doc"),
      (5L, "type lie doc"), (9L, "πéü𝄞 non-ascii slice boundaries " * 5))
      .toDF("doc_id", "text")
    val got = SqliteSim.rows(spark, docsDf).orderBy("doc_id", "row_idx").collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L, 2L, 9L),
      "damaged docs must contribute nothing")
    got.foreach { r =>
      val docId = r.getLong(0); val j = r.getInt(1)
      assert(r.getLong(2) == docId * 8 + j)
      assert(r.getLong(3) == (docId * 7 + j * 13) % 1000)
      assert(r.getLong(4) == j % 2)
      assert(r.getDouble(5) == j + 0.5)
      assert(r.getString(6).endsWith(SqliteSim.PAD))
    }
    val k1 = got.count(_.getLong(0) == 1L)
    assert(k1 == SqliteSim.kRows(1L))
  }

  // ---- sqlite3 CLI interop (the GNU-tar precedent: pin against the
  // independent implementation the ecosystem actually runs) ----------

  private def cliAvailable: Boolean =
    try {
      val p = new ProcessBuilder("sqlite3", "--version").start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }

  private def cli(db: String, sql: String): String = {
    val p = new ProcessBuilder("sqlite3", db).redirectErrorStream(true).start()
    p.getOutputStream.write((sql + "\n").getBytes("UTF-8"))
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
    p.waitFor()
    out
  }

  test("interop 1: our file passes sqlite's own integrity_check and SELECTs identical") {
    if (!cliAvailable) cancel("sqlite3 CLI not available")
    val text = "interop body text with some words in it repeated a bit " * 4
    val lay = SqliteCodec.write(Seq(
      SqliteSim.docsTable(11L, text), SqliteSim.metaTable(11L)))
    val f = SparkTestSession.tmpIoFile("graft132", ".db")
    f.deleteOnExit()
    java.nio.file.Files.write(f.toPath, lay.bytes)
    assert(cli(f.getAbsolutePath, "PRAGMA integrity_check;") == "ok",
      "sqlite3's own integrity_check must accept our file")
    val k = SqliteSim.kRows(11L)
    val sel = cli(f.getAbsolutePath,
      "SELECT count(*), sum(id), sum(val), sum(flag) FROM docs;")
    val want = Seq(k, (0 until k).map(11 * 8 + _).sum,
      (0 until k).map(j => (11 * 7 + j * 13) % 1000).sum,
      (0 until k).map(_ % 2).sum).mkString("|")
    assert(sel == want, s"CLI read: $sel vs $want")
    assert(cli(f.getAbsolutePath, "SELECT note FROM meta;") == "decoy")
  }

  test("interop 2: a CLI-written database (overflow + interior pages) walks through our decoder") {
    if (!cliAvailable) cancel("sqlite3 CLI not available")
    val f = SparkTestSession.tmpIoFile("cli132", ".db")
    f.delete()
    val mk = new StringBuilder
    mk.append("CREATE TABLE docs(id INTEGER PRIMARY KEY, val INTEGER, flag INTEGER, score REAL, body TEXT);")
    mk.append("CREATE TABLE meta(k INTEGER PRIMARY KEY, note TEXT);")
    mk.append("INSERT INTO meta VALUES(1,'decoy');")
    for (j <- 0 until 300) {
      val body = if (j % 7 == 0) ("B" + j) * 2000 else s"row-$j-body"
      mk.append(s"INSERT INTO docs VALUES($j, ${j * 13 % 1000}, ${j % 2}, $j.5, '$body');")
    }
    cli(f.getAbsolutePath, mk.toString)
    val rows = SqliteCodec.readTable(
      java.nio.file.Files.readAllBytes(f.toPath), "docs")
    assert(rows.size == 300)
    rows.zipWithIndex.foreach { case ((rowid, cols), j) =>
      assert(rowid == j && cols(0) == null)
      assert(cols(1) == (j * 13 % 1000).toLong && cols(2) == (j % 2).toLong)
      assert(cols(3) == j + 0.5)
      val want = if (j % 7 == 0) ("B" + j) * 2000 else s"row-$j-body"
      assert(cols(4) == want, s"body at $j")
    }
    f.delete()
  }
}
