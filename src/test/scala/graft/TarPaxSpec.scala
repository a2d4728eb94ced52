package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** d144: PAX-extended tar — the record grammar, the override pairing
  * rules, the damage classes, and GNU tar interop in both pax and gnu
  * formats. */
class TarPaxSpec extends AnyFunSuite {

  test("roundtrip: long names ride PAX headers and come back exact") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val members = TarPaxCodec.decode(TarPaxSim.payloadFor(docId))
        .getOrElse(fail(s"doc $docId quarantined"))
      assert(members.size == TarPaxSim.k(docId))
      members.zipWithIndex.foreach { case ((name, content), i) =>
        assert(name == TarPaxSim.nameFor(docId, i))
        assert(content.toSeq == TarPaxSim.contentFor(docId, i).toSeq)
      }
      assert(members.count(_._1.length > 100) ==
        (0 until TarPaxSim.k(docId)).count(_ % 2 == 0))
    }
  }

  test("damage classes: truncation, the lying record length, the dangling x-header") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L))
      assert(TarPaxCodec.decode(TarPaxSim.payloadFor(docId)).isEmpty,
        s"doc $docId should quarantine")
  }

  test("record grammar: exact lengths, keys, last-value-prevails") {
    def recs(s: String) = TarPaxCodec.parseRecords(s.getBytes("UTF-8"))
    assert(recs("14 path=a/b.c\n").map { case (k, v) =>
      (k, new String(v, "UTF-8")) } == Seq("path" -> "a/b.c"))
    // two records; duplicate key handling is the CALLER's (POSIX says
    // the last prevails — the decoder applies them in order)
    assert(recs("14 path=a/b.c\n14 path=d/e.f\n").size == 2)
    // sub-second GNU mtimes are value bytes like any other
    assert(recs("30 mtime=1700000000.123456789\n").head._1 == "mtime")
    for (bad <- Seq(
      "15 path=a/b.c\n", // length lies high
      "13 path=a/b.c\n", // length lies low (the newline lands off-end)
      "14 path=a/b.c ", // missing newline
      "5 =v\n", // empty key
      "x3 a=b\n", // no digits
      "14 path=a/b.c\njunk")) // trailing non-record bytes
      assertThrows[Throwable](recs(bad))
  }

  test("pairing rules: stacked overrides and global path/size quarantine") {
    // a 'g' header with a path record — out of scope, never guessed
    val member = Seq(("ok.txt", "data".getBytes("US-ASCII")))
    val good = TarPaxCodec.encode(member)
    assert(TarPaxCodec.decode(good).isDefined)
    // dangling tail (the encode flag used by the sim)
    assert(TarPaxCodec.decode(TarPaxCodec.encode(member,
      danglingTail = true)).isEmpty)
  }

  // ---- GNU tar CLI interop (the d104 precedent) ----------------------

  private def cliAvailable: Boolean =
    try {
      val p = new ProcessBuilder("tar", "--version").start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }

  private def run(cwd: java.io.File, cmd: String*): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    pb.directory(cwd)
    val p = pb.start()
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  private def tempDir(): java.io.File = {
    val d = SparkTestSession.tmpDir("graft144").toFile
    d.deleteOnExit()
    d
  }

  test("interop 1: GNU tar lists and extracts our PAX shards with full long names") {
    if (!cliAvailable) cancel("tar CLI not available")
    val dir = tempDir()
    val docId = 6L
    val shard = new java.io.File(dir, "shard.tar")
    java.nio.file.Files.write(shard.toPath, TarPaxSim.payloadFor(docId))
    val (rc, listing) = run(dir, "tar", "-tf", "shard.tar")
    assert(rc == 0, s"tar -tf: $listing")
    val names = listing.linesIterator.toSeq
    (0 until TarPaxSim.k(docId)).foreach { i =>
      assert(names.contains(TarPaxSim.nameFor(docId, i)),
        s"member $i name missing from tar's listing")
    }
    val (rc2, out2) = run(dir, "tar", "-xf", "shard.tar")
    assert(rc2 == 0, s"tar -xf: $out2")
    (0 until TarPaxSim.k(docId)).foreach { i =>
      val f = new java.io.File(dir, TarPaxSim.nameFor(docId, i))
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(f.toPath),
        TarPaxSim.contentFor(docId, i)), s"member $i bytes diverge")
    }
  }

  private def cliRoundtrip(format: String): Unit = {
    val dir = tempDir()
    val longName = "deep/" + ("nest/" * 12) +
      ("y" * 90) + ".txt" // > 100 bytes: forces the extension header
    val shortName = "top.txt"
    val files = Seq(longName -> ("long payload " * 9),
      shortName -> "short payload")
    files.foreach { case (name, content) =>
      val f = new java.io.File(dir, name)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
    }
    val (rc, out) = run(dir, "tar", s"--format=$format", "-cf", "out.tar",
      longName, shortName)
    assert(rc == 0, s"tar -cf: $out")
    val members = TarPaxCodec.decode(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "out.tar").toPath))
      .getOrElse(fail(s"real $format archive quarantined"))
    assert(members.map(_._1) == files.map(_._1))
    members.zip(files).foreach { case ((_, got), (_, want)) =>
      assert(new String(got, "UTF-8") == want)
    }
  }

  test("interop 2: a real tar --format=pax archive (x-headers) walks through our decoder") {
    if (!cliAvailable) cancel("tar CLI not available")
    cliRoundtrip("pax")
  }

  test("interop 3: a real tar --format=gnu archive (L longlinks) walks through our decoder") {
    if (!cliAvailable) cancel("tar CLI not available")
    cliRoundtrip("gnu")
  }
}
