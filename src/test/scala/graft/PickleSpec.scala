package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._
import graft.operators.PickleCodec._

/** d150: the refusing unpickler — stack/memo/frame discipline, the
  * refusal surface, damage classes, and interop both directions
  * against real python pickle at protocols 2 and 4. */
class PickleSpec extends AnyFunSuite {

  test("roundtrip: the gate record survives encode∘decode") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val v = PickleSim.valueFor(docId)
      assert(decode(PickleCodec.encode(v)).contains(v))
    }
    // edge values
    val edge = PDict(Seq(
      PStr("neg") -> PInt(-12345678901L),
      PStr("i32") -> PInt(Int.MinValue.toLong),
      PStr("f") -> PFloat(-0.0),
      PStr("u") -> PStr("héllo 中文 😀"),
      PStr("empty") -> PList(Seq.empty),
      PStr("t0") -> PTuple(Seq.empty),
      PStr("nest") -> PList(Seq(PTuple(Seq(PInt(1), PNone, PBool(false)))))))
    assert(decode(PickleCodec.encode(edge)).contains(edge))
  }

  test("damage classes: truncation, the spliced GLOBAL, the unfilled memo slot") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L))
      assert(decode(PickleSim.payloadFor(docId)).isEmpty,
        s"doc $docId should quarantine")
  }

  test("strict memo discipline: a BINGET of a slot BINPUT skipped over quarantines") {
    // BINPUT idx=5 backfills placeholder slots 0..4 — they are within
    // memo.size but were never WRITTEN, so a get of slot 3 must
    // quarantine, not silently return None (the r13 advice finding).
    // push, memoize at 5, then BINGET 3, STOP — the stack would hold
    // two values at STOP, but the get must already have thrown before
    // STOP's arity check can mask it
    val stream = Array[Byte](0x80.toByte, 2,
      'K', 7, 'q', 5, 'h', 3, '.')
    assert(decode(stream).isEmpty, "get from a skipped slot must refuse")
    // the WRITTEN slot still serves: put at 5, get 5, tuple2, works
    val ok = Array[Byte](0x80.toByte, 2,
      'K', 7, 'q', 5, 'h', 5, 0x86.toByte, '.')
    assert(decode(ok).contains(PTuple(Seq(PInt(7), PInt(7)))))
    // LONG_BINGET beyond any slot quarantines too
    val far = Array[Byte](0x80.toByte, 2,
      'K', 7, 'q', 0, 'j', 9, 0, 0, 0, '.')
    assert(decode(far).isEmpty)
  }

  test("the refusal surface: every executable opcode quarantines") {
    // hand-built streams that end in each forbidden opcode
    val prefix = Array[Byte](0x80.toByte, 2)
    for (bad <- Seq('c', 'R', 'b', 'i', 'o', 'P', 'Q', 0x93, 0x81, 0x92,
      0x82, 0x83, 0x84)) {
      val stream = prefix ++ Array[Byte](bad.toByte, '.'.toByte)
      assert(decode(stream).isEmpty, s"opcode $bad must refuse")
    }
    // trailing bytes after STOP
    assert(decode(PickleCodec.encode(PInt(1)) :+ 0.toByte).isEmpty)
    // STOP with a non-singleton stack
    assert(decode(Array[Byte](0x80.toByte, 2, 'K', 1, 'K', 2, '.')).isEmpty)
  }

  // ---- python interop ------------------------------------------------

  private def pythonOk: Boolean =
    try {
      val p = new ProcessBuilder("python3", "--version").start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }

  private def py(script: String): (Int, String) = {
    val p = new ProcessBuilder("python3", "-c", script)
      .redirectErrorStream(true).start()
    p.getOutputStream.close()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  test("interop 1: python loads our pickles value-identical") {
    if (!pythonOk) cancel("python3 not available")
    val f = SparkTestSession.tmpIoFile("graft150", ".pkl")
    f.deleteOnExit()
    val docId = 6L
    java.nio.file.Files.write(f.toPath,
      PickleCodec.encode(PickleSim.valueFor(docId)))
    val (rc, out) = py(
      s"""import pickle
         |d = pickle.load(open('${f.getAbsolutePath}', 'rb'))
         |assert d['id'] == $docId and d['split'] == '${PickleSim.split(docId)}'
         |assert d['score'] == ${PickleSim.score(docId)}
         |assert d['flags'] == (True, None)
         |print(sum(d['tokens']), len(d['tokens']))
         |""".stripMargin)
    assert(rc == 0, s"python rejected our pickle: $out")
    val Array(s, n) = out.trim.split(" ")
    assert(n.toInt == PickleSim.k(docId))
    assert(s.toLong == (0 until PickleSim.k(docId))
      .map(PickleSim.token(docId, _)).sum)
  }

  test("interop 2: real pickle.dumps at protocols 2 AND 4 walk through our reader") {
    if (!pythonOk) cancel("python3 not available")
    val dir = SparkTestSession.tmpDir("graft150").toFile
    dir.deleteOnExit()
    val (rc, out) = py(
      s"""import pickle
         |d = {'id': 42, 'split': 'train', 'score': 2.75,
         |     'tokens': [5, 17, 170, 70000, -3],
         |     'flags': (True, None), 'nested': {'a': [1, 2], 'b': 'x'}}
         |open('${dir.getAbsolutePath}/p2.pkl', 'wb').write(pickle.dumps(d, 2))
         |open('${dir.getAbsolutePath}/p4.pkl', 'wb').write(pickle.dumps(d, 4))
         |print('ok')
         |""".stripMargin)
    assert(rc == 0, out)
    for (name <- Seq("p2.pkl", "p4.pkl")) {
      val v = decode(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, name).toPath))
        .getOrElse(fail(s"real $name quarantined"))
      val m = v.asInstanceOf[PDict].items
        .collect { case (PStr(k), x) => k -> x }.toMap
      assert(m("id") == PInt(42))
      assert(m("split") == PStr("train"))
      assert(m("score") == PFloat(2.75))
      assert(m("tokens") == PList(Seq(PInt(5), PInt(17), PInt(170),
        PInt(70000), PInt(-3))))
      assert(m("flags") == PTuple(Seq(PBool(true), PNone)))
      assert(m("nested").asInstanceOf[PDict].items.toMap ==
        Map(PStr("a") -> PList(Seq(PInt(1), PInt(2))), PStr("b") -> PStr("x")))
    }
    // and an EXECUTABLE pickle from python refuses: the whole point
    val (rc2, _) = py(
      s"""import pickle
         |class Evil:
         |    def __reduce__(self):
         |        return (print, ('pwned',))
         |open('${dir.getAbsolutePath}/evil.pkl', 'wb').write(pickle.dumps(Evil(), 2))
         |print('ok')
         |""".stripMargin)
    assert(rc2 == 0)
    assert(decode(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "evil.pkl").toPath)).isEmpty,
      "an executable pickle MUST refuse")
  }
}
