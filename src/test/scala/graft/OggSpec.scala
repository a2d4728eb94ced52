package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{OggPages, OggSim}

/** d161: the Ogg page walk — capture/lacing grammar, the CRC-32
  * recompute, continuation/BOS/EOS/granule discipline, the damage
  * grid and the truncation sweep. */
class OggSpec extends AnyFunSuite {

  private val TEXT =
    ("the quick brown fox jumps over the lazy dog — ogg page test " * 20).trim

  test("roundtrip: packets reassemble byte-exact across page boundaries") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L, 16L, 18L, 20L, 23L)) {
      val st = OggPages.decode(OggSim.payloadFor(docId, TEXT))
        .getOrElse(fail(s"doc $docId quarantined"))
      assert(st.packets.size == OggSim.nPackets(docId))
      val joined = st.packets.map(new String(_, "UTF-8")).mkString
      assert(joined == TEXT)
      // BOS exactly on the first page, EOS exactly on the last
      assert((st.pages.head.headerType & 0x02) != 0)
      assert(st.pages.tail.forall(p => (p.headerType & 0x02) == 0))
      assert((st.pages.last.headerType & 0x04) != 0)
      assert(st.pages.init.forall(p => (p.headerType & 0x04) == 0))
      // the multi-page claim is real: long docs must actually span
      assert(st.pages.size > 1)
      // granules: non-decreasing over the non-(-1) pages, final = K
      val gs = st.pages.map(_.granule).filter(_ != -1L)
      assert(gs == gs.sorted)
      assert(gs.last == OggSim.nPackets(docId))
    }
  }

  test("damage grid: truncation, the lying granule, the flipped CRC") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L, 26L, 33L, 40L))
      assert(OggPages.decode(OggSim.payloadFor(docId, TEXT)).isEmpty,
        s"doc $docId should quarantine")
  }

  test("every truncation quarantines (EOS + dangling-packet rules close the boundary holes)") {
    // unlike MP3, Ogg IS closed under truncation audits: a boundary
    // cut drops the EOS page (or leaves a packet dangling), so every
    // cut of any kind must quarantine
    val clean = OggSim.payloadFor(1L, TEXT)
    (1 until clean.length).foreach { keep =>
      assert(OggPages.decode(java.util.Arrays.copyOf(clean, keep)).isEmpty,
        s"truncation to $keep bytes must quarantine")
    }
  }

  test("rejection grid: version, reserved bits, sequence gap, serial splice, stray BOS") {
    val clean = OggSim.payloadFor(1L, TEXT)
    def flip(at: Int, v: Int): Array[Byte] = {
      val c = clean.clone(); c(at) = v.toByte; c
    }
    assert(OggPages.decode(flip(4, 1)).isEmpty, "version 1")
    assert(OggPages.decode(flip(5, (clean(5) | 0x10))).isEmpty, "reserved bit")
    // find the second page: first page length = 27 + nSegs + payload
    val n0 = clean(26) & 0xff
    val pay0 = (0 until n0).map(i => clean(27 + i) & 0xff).sum
    val p2 = 27 + n0 + pay0
    assert(clean(p2) == 'O' && clean(p2 + 3) == 'S')
    // CRC-valid header lies need the CRC recomputed; a raw field flip
    // is caught by the CRC first — both failure orders are covered
    assert(OggPages.decode(flip(p2 + 18, (clean(p2 + 18) ^ 1))).isEmpty,
      "sequence gap (and CRC) must quarantine")
    assert(OggPages.decode(flip(p2 + 14, (clean(p2 + 14) ^ 1))).isEmpty,
      "serial splice (and CRC) must quarantine")
    assert(OggPages.decode(flip(p2 + 5, (clean(p2 + 5) | 0x02))).isEmpty,
      "stray BOS (and CRC) must quarantine")
    // a PAGE-LEVEL byte flip anywhere must quarantine (CRC recompute)
    (0 until clean.length by 11).foreach { i =>
      val c = clean.clone(); c(i) = (c(i) ^ 0x20).toByte
      assert(OggPages.decode(c).isEmpty, s"flip at $i")
    }
  }

  test("ogg crc32 known vector") {
    // the Ogg variant of CRC-32 (0x04C11DB7 MSB-first, init 0, no
    // final xor) over "123456789" — independently computed vector
    val v = "123456789".getBytes("US-ASCII")
    assert(OggPages.crc32(v, 0, v.length) == 0x89A1897FL)
  }
}
