package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Cbor, CborSim}
import graft.operators.Cbor._

/** d167: CBOR under RFC 8949 deterministic encoding — encode∘decode
  * identity, the shortest-form and sorted-keys rejection grids, the
  * damage grid and the truncation sweep. */
class CborSpec extends AnyFunSuite {

  private val TEXT = "the quick brown fox jumps över the lazy dog 試験 " * 8
  private def by(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  test("roundtrip: every width class and container survives") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L, 127L, 128L, 255L,
      256L, 65535L, 65536L)) {
      if (docId % 7 != 0 && docId % 7 != 3 && docId % 7 != 5) {
        val v = CborSim.recordFor(docId, TEXT)
        val enc = Cbor.encode(v)
        val dec = Cbor.decode(enc).getOrElse(fail(s"doc $docId quarantined"))
        // maps decode in ENCODED (deterministic) order, so the value
        // identity is up to key order; the BYTE identity is the real
        // deterministic-encoding check: re-encoding the decoded value
        // must reproduce the exact bytes (canonical fixed point)
        assert(Cbor.encode(dec).sameElements(enc), s"doc $docId bytes")
        (v, dec) match {
          case (VMap(a), VMap(b)) => assert(a.toMap == b.toMap, s"doc $docId")
          case _ => fail("expected maps")
        }
      }
    }
    for (x <- Seq(0L, 23L, 24L, 255L, 256L, 65535L, 65536L, 0xffffffffL,
      1L << 32, Long.MaxValue, -1L, -24L, -25L, -256L, -257L, -65536L,
      -65537L, Int.MinValue.toLong, Long.MinValue)) {
      assert(Cbor.decode(Cbor.encode(VInt(x))).contains(VInt(x)), s"$x")
    }
    for (n <- Seq(0, 23, 24, 255, 256, 300)) {
      val s = VStr("é" * n)
      assert(Cbor.decode(Cbor.encode(s)).contains(s))
    }
    assert(Cbor.decode(Cbor.encode(VNull)).contains(VNull))
    assert(Cbor.decode(Cbor.encode(VFloat(0.25))).contains(VFloat(0.25)))
    assert(Cbor.decode(Cbor.encode(VBool(true))).contains(VBool(true)))
  }

  test("the encoder emits RFC 8949 example bytes (spec vectors)") {
    // appendix A vectors for the types in scope
    assert(Cbor.encode(VInt(0)).sameElements(by(0x00)))
    assert(Cbor.encode(VInt(23)).sameElements(by(0x17)))
    assert(Cbor.encode(VInt(24)).sameElements(by(0x18, 0x18)))
    assert(Cbor.encode(VInt(1000)).sameElements(by(0x19, 0x03, 0xe8)))
    assert(Cbor.encode(VInt(-1)).sameElements(by(0x20)))
    assert(Cbor.encode(VInt(-1000)).sameElements(by(0x39, 0x03, 0xe7)))
    assert(Cbor.encode(VStr("IETF")).sameElements(
      by(0x64, 0x49, 0x45, 0x54, 0x46)))
    assert(Cbor.encode(VFloat(1.1)).sameElements(
      by(0xfb, 0x3f, 0xf1, 0x99, 0x99, 0x99, 0x99, 0x99, 0x9a)))
    assert(Cbor.encode(VArr(Seq(VInt(1), VInt(2), VInt(3)))).sameElements(
      by(0x83, 0x01, 0x02, 0x03)))
    // §4.2.1 key order: "a" (0x61 61) sorts before "aa" (0x62 61 61)
    assert(Cbor.encode(VMap(Seq("aa" -> VInt(2), "a" -> VInt(1)))).sameElements(
      by(0xa2, 0x61, 0x61, 0x01, 0x62, 0x61, 0x61, 0x02)))
  }

  test("damage grid: truncation, the non-canonical width, the unsorted keys") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L, 26L, 33L, 40L))
      assert(Cbor.decode(CborSim.payloadFor(docId, TEXT)).isEmpty,
        s"doc $docId should quarantine")
    for (docId <- Seq(1L, 2L, 4L, 6L))
      assert(Cbor.decode(CborSim.payloadFor(docId, TEXT)).nonEmpty)
  }

  test("case-3 damage lands on the real 'small' entry, not inside text") {
    // text deliberately contains the encoded-key byte pattern for
    // "small" (0x65 's' 'm' 'a' 'l' 'l'): a byte-search locator would
    // corrupt the string body instead of widening the "small" value.
    val trap = "esmall decoy esmall " + TEXT
    val damaged = CborSim.payloadFor(3L, trap)
    assert(Cbor.decode(damaged).isEmpty, "still quarantines")
    // the advertised damage class: widen-only — restoring the value's
    // five ai-26 bytes back to the immediate form recovers the clean
    // payload byte-for-byte, which only holds if the damage hit the
    // real map entry (a string-body hit cannot be undone this way)
    val clean = Cbor.encode(CborSim.recordFor(3L, trap))
    val key = Cbor.encode(VStr("small"))
    var at = -1
    var i = 0
    while (at < 0 && i + key.length <= clean.length) {
      if (clean.slice(i, i + key.length).sameElements(key) &&
          damaged.length == clean.length + 4 &&
          (damaged(i + key.length) & 0xff) == 0x1a) at = i + key.length
      i += 1
    }
    assert(at >= 0, "damage site is the byte after the real 'small' key")
    val undone = damaged.slice(0, at) ++
      Array(damaged(at + 4)) ++ damaged.slice(at + 5, damaged.length)
    assert(undone.sameElements(clean), "widen-only damage class")
  }

  test("every truncation quarantines; every appended byte too") {
    val clean = CborSim.payloadFor(1L, TEXT)
    (1 until clean.length).foreach { keep =>
      assert(Cbor.decode(java.util.Arrays.copyOf(clean, keep)).isEmpty,
        s"truncation to $keep")
    }
    assert(Cbor.decode(clean :+ 0x00.toByte).isEmpty, "trailing byte")
  }

  test("shortest-form rejection grid") {
    // 1 at ai 24/25/26/27
    assert(Cbor.decode(by(0x18, 0x01)).isEmpty)
    assert(Cbor.decode(by(0x19, 0x00, 0x01)).isEmpty)
    assert(Cbor.decode(by(0x1a, 0, 0, 0, 1)).isEmpty)
    assert(Cbor.decode(by(0x1b, 0, 0, 0, 0, 0, 0, 0, 1)).isEmpty)
    // -1 at ai 24 (immediate covers it)
    assert(Cbor.decode(by(0x38, 0x00)).isEmpty)
    // 1-char text at ai 24
    assert(Cbor.decode(by(0x78, 0x01, 'a')).isEmpty)
    // the canonical forms DO decode
    assert(Cbor.decode(by(0x01)).contains(VInt(1)))
    assert(Cbor.decode(by(0x20)).contains(VInt(-1)))
    assert(Cbor.decode(by(0x81, 0x01)).contains(VArr(Seq(VInt(1)))))
  }

  test("deterministic/grammar rejection: order, dups, keys, indefinite, tags, f16") {
    // unsorted map keys ("aa" before "a")
    assert(Cbor.decode(
      by(0xa2, 0x62, 'a', 'a', 0x02, 0x61, 'a', 0x01)).isEmpty)
    // duplicate key
    assert(Cbor.decode(
      by(0xa2, 0x61, 'k', 0x01, 0x61, 'k', 0x02)).isEmpty)
    // int key (scope: keys are text)
    assert(Cbor.decode(by(0xa1, 0x01, 0x01)).isEmpty)
    // invalid UTF-8 in text
    assert(Cbor.decode(by(0x61, 0xff)).isEmpty)
    // indefinite lengths (forbidden by deterministic encoding)
    assert(Cbor.decode(by(0x9f, 0x01, 0xff)).isEmpty) // array
    assert(Cbor.decode(by(0xbf, 0x61, 'k', 0x01, 0xff)).isEmpty) // map
    assert(Cbor.decode(by(0x7f, 0x61, 'a', 0xff)).isEmpty) // text
    // tags out of scope
    assert(Cbor.decode(by(0xc0, 0x61, 'a')).isEmpty)
    // float16/float32 out of scope; float64 in
    assert(Cbor.decode(by(0xf9, 0x3c, 0x00)).isEmpty)
    assert(Cbor.decode(by(0xfa, 0x3f, 0x80, 0x00, 0x00)).isEmpty)
    assert(Cbor.decode(
      by(0xfb, 0x3f, 0xd0, 0, 0, 0, 0, 0, 0)).contains(VFloat(0.25)))
    // reserved ai 28-30
    assert(Cbor.decode(by(0x1c)).isEmpty)
    // uint64 above Long.MaxValue (scope rule)
    assert(Cbor.decode(
      by(0x1b, 0x80, 0, 0, 0, 0, 0, 0, 0)).isEmpty)
    // depth bomb: 40 nested single-element arrays
    val bomb = Array.fill(40)(0x81.toByte) :+ 0x01.toByte
    assert(Cbor.decode(bomb).isEmpty)
    val ok = Array.fill(8)(0x81.toByte) :+ 0x01.toByte
    assert(Cbor.decode(ok).nonEmpty)
  }
}
