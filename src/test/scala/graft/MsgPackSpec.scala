package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MsgPack, MsgPackSim}
import graft.operators.MsgPack._

/** d162: MessagePack — encode∘decode identity, the canonical-width
  * rejection grid, strict UTF-8, key discipline, the damage grid and
  * the truncation sweep. */
class MsgPackSpec extends AnyFunSuite {

  private val TEXT = "the quick brown fox jumps över the lazy dog 試験 " * 8

  test("roundtrip: every width class and container survives") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L, 127L, 128L, 255L,
      256L, 65535L, 65536L)) {
      if (docId % 7 != 0 && docId % 7 != 3 && docId % 7 != 5) {
        val v = MsgPackSim.recordFor(docId, TEXT)
        assert(MsgPack.decode(MsgPack.encode(v)).contains(v),
          s"doc $docId roundtrip")
      }
    }
    // edge values across every integer encoding boundary
    for (x <- Seq(0L, 127L, 128L, 255L, 256L, 65535L, 65536L, 0xffffffffL,
      1L << 32, Long.MaxValue, -1L, -32L, -33L, -128L, -129L, -32768L,
      -32769L, Int.MinValue.toLong, Int.MinValue - 1L, Long.MinValue)) {
      assert(MsgPack.decode(MsgPack.encode(VInt(x))).contains(VInt(x)), s"$x")
    }
    // strings across fixstr/str8/str16 boundaries, with multibyte
    for (n <- Seq(0, 31, 32, 255, 256, 300)) {
      val s = VStr("é" * n)
      assert(MsgPack.decode(MsgPack.encode(s)).contains(s))
    }
    assert(MsgPack.decode(MsgPack.encode(VNil)).contains(VNil))
    assert(MsgPack.decode(MsgPack.encode(VFloat(0.25))).contains(VFloat(0.25)))
  }

  test("damage grid: truncation, the non-canonical width, the lying bin length") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L, 26L, 33L, 40L))
      assert(MsgPack.decode(MsgPackSim.payloadFor(docId, TEXT)).isEmpty,
        s"doc $docId should quarantine")
  }

  test("every truncation quarantines; every appended byte too") {
    val clean = MsgPackSim.payloadFor(1L, TEXT)
    (1 until clean.length).foreach { keep =>
      assert(MsgPack.decode(java.util.Arrays.copyOf(clean, keep)).isEmpty,
        s"truncation to $keep")
    }
    assert(MsgPack.decode(clean :+ 0x00.toByte).isEmpty, "trailing byte")
  }

  test("canonical rejection grid: every non-shortest width quarantines") {
    def by(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray
    // 1 as uint8/uint16/uint32/uint64/int8(positive out of range)
    assert(MsgPack.decode(by(0xcc, 0x01)).isEmpty)
    assert(MsgPack.decode(by(0xcd, 0x00, 0x01)).isEmpty)
    assert(MsgPack.decode(by(0xce, 0, 0, 0, 1)).isEmpty)
    assert(MsgPack.decode(by(0xcf, 0, 0, 0, 0, 0, 0, 0, 1)).isEmpty)
    // -1 as int8/int16 (fixneg covers it)
    assert(MsgPack.decode(by(0xd0, 0xff)).isEmpty)
    assert(MsgPack.decode(by(0xd1, 0xff, 0xff)).isEmpty)
    // short string as str8 (fixstr covers < 32)
    assert(MsgPack.decode(by(0xd9, 0x01, 'a')).isEmpty)
    // small array as array16, small map as map16
    assert(MsgPack.decode(by(0xdc, 0x00, 0x01, 0x01)).isEmpty)
    assert(MsgPack.decode(by(0xde, 0x00, 0x01, 0xa1, 'k', 0x01)).isEmpty)
    // the canonical forms of the same values DO decode
    assert(MsgPack.decode(by(0x01)).contains(VInt(1)))
    assert(MsgPack.decode(by(0xff)).contains(VInt(-1)))
    assert(MsgPack.decode(by(0x91, 0x01)).contains(VArr(Seq(VInt(1)))))
  }

  test("grammar rejection: invalid UTF-8, non-string keys, dup keys, depth bomb, 0xc1") {
    def by(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray
    // fixstr carrying an invalid UTF-8 byte
    assert(MsgPack.decode(by(0xa1, 0xff)).isEmpty)
    // map with an int key
    assert(MsgPack.decode(by(0x81, 0x01, 0x01)).isEmpty)
    // map with a duplicate key
    assert(MsgPack.decode(
      by(0x82, 0xa1, 'k', 0x01, 0xa1, 'k', 0x02)).isEmpty)
    // 0xc1 is never used
    assert(MsgPack.decode(by(0xc1)).isEmpty)
    // a 40-deep fixarray nest overruns the depth cap
    val bomb = Array.fill(40)(0x91.toByte) :+ 0x01.toByte
    assert(MsgPack.decode(bomb).isEmpty)
    // 33-deep is fine? cap is 32 — verify a modest nest decodes
    val ok = Array.fill(8)(0x91.toByte) :+ 0x01.toByte
    assert(MsgPack.decode(ok).nonEmpty)
  }
}
