package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** d149: the numpy format — the dict-literal header grammar, the
  * shape-vs-bytes rule, npz over the zip walker, damage classes, and
  * interop BOTH directions against real numpy via the python3 CLI. */
class NpySpec extends AnyFunSuite {

  test("roundtrip: the gate npz decodes to the closed-form arrays") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val arrays = NpyCodec.decodeNpz(NpySim.npzFor(docId))
        .getOrElse(fail(s"doc $docId quarantined")).toMap
      val kk = NpySim.k(docId)
      assert(arrays("ids").shape == Seq(kk.toLong))
      assert(arrays("feats").shape == Seq(kk.toLong, 6L))
      assert(arrays("labels").shape == Seq(kk.toLong))
    }
  }

  test("damage classes: truncation, the lying shape, the unknown header key") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L))
      assert(NpyCodec.decodeNpz(NpySim.npzFor(docId)).isEmpty,
        s"doc $docId should quarantine")
  }

  test("header grammar: quoting, tuples, padding, terminator, scope rules") {
    def hdr(s: String) = NpyCodec.parseHeader(s)
    assert(hdr("{'descr': '<f4', 'fortran_order': False, 'shape': (3, 4), }  \n") ==
      (("<f4", false, Seq(3L, 4L))))
    assert(hdr("{'descr': '<i8', 'fortran_order': False, 'shape': (5,), }\n")._3 ==
      Seq(5L))
    assert(hdr("{'descr': '|u1', 'fortran_order': False, 'shape': (), }\n")._3 ==
      Seq.empty)
    assert(hdr("{'descr': '<f8', 'fortran_order': True, 'shape': (2,), }\n")._2)
    for (bad <- Seq(
      "{'descr': '<f4', 'fortran_order': False, 'shape': (3, 4), }  ", // no \n
      "{'descr': '<f4', 'shape': (3,), }\n", // missing key
      "{'descr': '<f4', 'fortran_order': False, 'shape': (3), }\n", // 1-tuple form
      "{'descr': '<f4', 'fortran_order': Maybe, 'shape': (3,), }\n",
      "{'descr': '<f4', 'fortran_order': False, 'shape': (3,), 'x': 1, }\n",
      "{'descr': '<f4', 'fortran_order': False, 'shape': (3,), } x\n"))
      assertThrows[Throwable](hdr(bad))
  }

  test("the shape-vs-bytes rule and the scope rules refuse") {
    val data8 = new Array[Byte](8)
    assert(NpyCodec.decode(NpyCodec.encode("<i8", Seq(1L), data8)).isDefined)
    // data longer and shorter than the shape claims
    val good = NpyCodec.encode("<i8", Seq(1L), data8)
    assert(NpyCodec.decode(good :+ 0.toByte).isEmpty)
    assert(NpyCodec.decode(java.util.Arrays.copyOf(good, good.length - 1)).isEmpty)
    // big-endian and fortran order: never guessed
    assert(NpyCodec.decode(NpyCodec.encode(">f4", Seq(2L), data8)).isEmpty)
  }

  // ---- numpy CLI interop --------------------------------------------

  private def pythonOk: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import numpy").start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }

  private def py(script: String): (Int, String) = {
    val p = new ProcessBuilder("python3", "-c", script)
      .redirectErrorStream(true).start()
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  private def tempDir(): java.io.File = {
    val d = SparkTestSession.tmpDir("graft149").toFile
    d.deleteOnExit()
    d
  }

  test("interop 1: numpy loads our npy and npz with matching dtype/shape/values") {
    if (!pythonOk) cancel("python3/numpy not available")
    val dir = tempDir()
    val npz = new java.io.File(dir, "doc.npz")
    java.nio.file.Files.write(npz.toPath, NpySim.npzFor(6L))
    val kk = NpySim.k(6L)
    val (rc, out) = py(
      s"""import numpy as np
         |z = np.load('${npz.getAbsolutePath}')
         |ids, feats, labels = z['ids'], z['feats'], z['labels']
         |assert ids.dtype == np.int64 and ids.shape == ($kk,), ids.dtype
         |assert feats.dtype == np.float32 and feats.shape == ($kk, 6)
         |assert labels.dtype == np.uint8
         |print(int(ids.sum()), float(feats.sum()), int(labels.sum()))
         |""".stripMargin)
    assert(rc == 0, s"numpy rejected our npz: $out")
    val Array(sIds, sFeats, sLabels) = out.trim.split(" ")
    val wantIds = (0 until kk).map(NpySim.idVal(6L, _)).sum
    val wantFeats = (for (i <- 0 until kk; j <- 0 until 6)
      yield NpySim.featVal(6L, i, j).toDouble).sum
    val wantLabels = (0 until kk).map(NpySim.labelVal(6L, _).toLong).sum
    assert(sIds.toLong == wantIds && sLabels.toLong == wantLabels)
    assert(math.abs(sFeats.toDouble - wantFeats) < 1e-9)
  }

  test("interop 2: numpy-written npy and npz walk through our decoder value-identical") {
    if (!pythonOk) cancel("python3/numpy not available")
    val dir = tempDir()
    val (rc, out) = py(
      s"""import numpy as np
         |d = '${dir.getAbsolutePath}'
         |np.save(d + '/a.npy', np.arange(12, dtype=np.int64).reshape(3, 4) * 7)
         |np.save(d + '/b.npy', (np.arange(5, dtype=np.float32) * 0.25))
         |np.save(d + '/c.npy', np.array(3.5, dtype=np.float64))
         |np.savez(d + '/z.npz', x=np.arange(6, dtype=np.int32),
         |         y=np.full((2, 2), 9, dtype=np.uint8))
         |print('ok')
         |""".stripMargin)
    assert(rc == 0, out)
    def load(name: String) = NpyCodec.decode(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, name).toPath))
      .getOrElse(fail(s"real numpy $name quarantined"))
    val a = load("a.npy")
    assert(a.descr == "<i8" && a.shape == Seq(3L, 4L))
    val aVals = (0 until 12).map { i =>
      var v = 0L
      (0 until 8).foreach(b => v |= (a.data(8 * i + b) & 0xffL) << (8 * b))
      v
    }
    assert(aVals == (0 until 12).map(_ * 7L))
    val b = load("b.npy")
    assert(b.descr == "<f4" && b.shape == Seq(5L))
    val c = load("c.npy")
    assert(c.descr == "<f8" && c.shape == Seq.empty)
    val z = NpyCodec.decodeNpz(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "z.npz").toPath))
      .getOrElse(fail("real numpy npz quarantined")).toMap
    assert(z("x").descr == "<i4" && z("x").shape == Seq(6L))
    assert(z("y").descr == "|u1" && z("y").shape == Seq(2L, 2L))
    assert(z("y").data.forall(_ == 9))
  }
}
