package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** d142: git packfiles — the object grammar, both delta encodings,
  * the trailer/identity/crc/fanout/offset/linkage audits, the damage
  * classes, and interop BOTH directions against the git CLI. */
class GitPackSpec extends AnyFunSuite {

  private val TEXT =
    "fn main() { println!(\"hello corpus\"); }\n// a code-ish document\n" * 3

  test("roundtrip: pack + idx written, walked back with every audit ON") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val w = GitPackSim.writtenFor(docId, TEXT)
      val objs = GitPack.read(w.pack, w.idx)
        .getOrElse(fail(s"doc $docId quarantined"))
      val kk = GitPackSim.k(docId)
      assert(objs.size == kk + 2)
      val blobs = objs.filter(_.tpe == GitPack.T_BLOB)
      assert(blobs.size == kk)
      assert(objs.count(_.wasDelta) == kk - 1)
      assert(new String(blobs.head.content, "UTF-8") == TEXT)
      (1 until kk).foreach { j =>
        assert(new String(blobs(j).content, "UTF-8") ==
          TEXT + GitPackSim.revSuffix(docId, j))
      }
    }
  }

  test("damage classes: truncation, the lying idx offset, the lying delta source size") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L)) {
      val (pack, idx) = GitPackSim.damagedFor(docId, TEXT)
      assert(GitPack.read(pack, idx).isEmpty, s"doc $docId should quarantine")
    }
  }

  test("every pack truncation quarantines; a flipped content byte breaks the id audit") {
    val w = GitPackSim.writtenFor(1L, TEXT)
    Seq(0, 1, 5, 11, 13, 40, w.pack.length / 2, w.pack.length - 21,
      w.pack.length - 1).foreach { cut =>
      assert(GitPack.read(java.util.Arrays.copyOf(w.pack, cut), w.idx).isEmpty)
    }
    // flip one byte mid-pack: either a zlib check, the trailer, or the
    // sha identity catches it — never a wrong answer
    (12 until w.pack.length by 7).foreach { i =>
      val bad = w.pack.clone()
      bad(i) = (bad(i) ^ 0x40).toByte
      assert(GitPack.read(bad, w.idx).isEmpty, s"flip at $i")
    }
  }

  test("delta application is strict: bad copies, reserved cmd, size lies all rejected") {
    val base = "0123456789abcdef".getBytes("US-ASCII")
    val d = GitPack.deltaCopyPlusInsert(base.length, "+tail".getBytes)
    assert(new String(GitPack.applyDelta(base, d), "US-ASCII") ==
      "0123456789abcdef+tail")
    // declared source size one off
    val lie = GitPack.deltaCopyPlusInsert(base.length, "+tail".getBytes,
      lieSrcSize = true)
    assertThrows[Throwable](GitPack.applyDelta(base, lie))
    // a copy past the base
    assertThrows[Throwable](GitPack.applyDelta(base,
      Array[Byte](16, 17, 0x91.toByte, 16, 17))) // off=16 sz=17 > base
    // reserved cmd 0
    assertThrows[Throwable](GitPack.applyDelta(base,
      Array[Byte](16, 1, 0)))
  }

  // ---- git CLI interop (the sqlite3/GNU-tar precedent) --------------

  private def cliAvailable: Boolean =
    try {
      val p = new ProcessBuilder("git", "--version").start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }

  private def run(cwd: java.io.File, cmd: String*): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    pb.directory(cwd)
    pb.environment().put("GIT_CONFIG_NOSYSTEM", "1")
    pb.environment().put("HOME", cwd.getAbsolutePath)
    val p = pb.start()
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  private def tempDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft142").toFile
    d.deleteOnExit()
    d
  }

  test("interop 1: git index-pack accepts our pack and emits a byte-identical idx") {
    if (!cliAvailable) cancel("git CLI not available")
    val dir = tempDir()
    assert(run(dir, "git", "init", "-q", ".")._1 == 0)
    for (docId <- Seq(1L, 2L, 6L, 9L)) {
      val w = GitPackSim.writtenFor(docId, TEXT)
      val packF = new java.io.File(dir, s"p$docId.pack")
      java.nio.file.Files.write(packF.toPath, w.pack)
      val (rc, out) = run(dir, "git", "index-pack", packF.getAbsolutePath)
      assert(rc == 0, s"git index-pack rejected our pack (doc $docId): $out")
      val gitIdx = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, s"p$docId.idx").toPath)
      assert(java.util.Arrays.equals(gitIdx, w.idx),
        s"doc $docId: git's idx and ours diverge")
      // and git's own verifier passes the pair
      val (rc2, out2) = run(dir, "git", "verify-pack", "-v",
        packF.getAbsolutePath)
      assert(rc2 == 0, s"verify-pack: $out2")
      assert(out2.contains("blob") && out2.contains("tree") &&
        out2.contains("commit"))
    }
  }

  test("interop 2: a pack written by git pack-objects walks through our reader") {
    if (!cliAvailable) cancel("git CLI not available")
    val dir = tempDir()
    assert(run(dir, "git", "init", "-q", ".")._1 == 0)
    val files = (0 until 6).map { j =>
      // shared prefixes invite git's own delta chains
      s"src$j.txt" -> (TEXT * 4 + s"\nunique tail $j\n")
    }
    files.foreach { case (name, content) =>
      java.nio.file.Files.write(new java.io.File(dir, name).toPath,
        content.getBytes("UTF-8"))
    }
    assert(run(dir, "git", "add", ".")._1 == 0)
    assert(run(dir, "git", "-c", "user.name=t", "-c", "user.email=t@t",
      "commit", "-q", "-m", "corpus snapshot")._1 == 0)
    // every object, packed with delta search on
    val (rcL, outL) = run(dir, "git", "rev-list", "--objects", "HEAD")
    assert(rcL == 0)
    val listF = new java.io.File(dir, "objlist")
    java.nio.file.Files.write(listF.toPath, outL.getBytes("UTF-8"))
    val (rcP, _) = run(dir, "bash", "-c", "git pack-objects pk < objlist")
    assert(rcP == 0)
    val packs = dir.listFiles().filter(_.getName.endsWith(".pack"))
    assert(packs.nonEmpty)
    val pack = java.nio.file.Files.readAllBytes(packs.head.toPath)
    val idx = java.nio.file.Files.readAllBytes(new java.io.File(dir,
      packs.head.getName.stripSuffix(".pack") + ".idx").toPath)
    val objs = GitPack.read(pack, idx)
      .getOrElse(fail("real git pack quarantined"))
    assert(objs.count(_.tpe == GitPack.T_BLOB) == 6)
    assert(objs.count(_.tpe == GitPack.T_TREE) == 1)
    assert(objs.count(_.tpe == GitPack.T_COMMIT) == 1)
    val contents = objs.filter(_.tpe == GitPack.T_BLOB)
      .map(o => new String(o.content, "UTF-8")).toSet
    assert(contents == files.map(_._2).toSet)
  }
}
