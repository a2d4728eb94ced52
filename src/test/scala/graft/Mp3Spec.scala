package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Mp3Frames, Mp3Sim}

/** d160: the MP3 frame walk — sync grammar, bitrate/samplerate
  * tables, the CRC-16 recompute, ID3v2/v1 spans, the damage grid and
  * the truncation sweep. No MP3 implementation exists in this
  * container; the pin is encode∘decode identity + this rejection
  * grid. */
class Mp3Spec extends AnyFunSuite {

  test("roundtrip: frame geometry, protection flags and tag spans survive") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L, 16L, 18L, 20L, 23L)) {
      val m = Mp3Frames.decode(Mp3Sim.payloadFor(docId))
        .getOrElse(fail(s"doc $docId quarantined"))
      assert(m.frames.size == Mp3Sim.nFrames(docId))
      m.frames.zipWithIndex.foreach { case (fr, f) =>
        assert(fr.kbps == Mp3Frames.BITRATE(Mp3Sim.brIdx(docId, f)))
        assert(fr.sampleRate == 44100)
        assert(fr.protected_ == Mp3Sim.isProtected(docId, f))
        assert(fr.mono == Mp3Sim.mono(docId))
        assert(fr.length == Mp3Sim.frameLen(docId, f))
      }
      assert(m.id3Bytes ==
        (if (Mp3Sim.hasId3v2(docId)) 10 + Mp3Sim.id3PayloadLen(docId) else 0))
      assert(m.id3v1 == Mp3Sim.hasId3v1(docId))
    }
  }

  test("'TAG' bytes inside frame content are not a trailer (tiling decides)") {
    // one unprotected 128 kbps stereo frame (length 417); plant
    // 'TAG' at exactly EOF-128, INSIDE the payload. The trailer
    // interpretation would cut the frame mid-payload, so the walker
    // must fall back to the no-trailer walk and accept (r14 advice:
    // position alone must never truncate a clean stream).
    val len = 144000 * 128 / 44100 // 417, no padding
    val b = new Array[Byte](len)
    b(0) = 0xFF.toByte; b(1) = 0xFB.toByte // MPEG-1 L3, unprotected
    b(2) = 0x90.toByte; b(3) = 0x00        // 128 kbps, 44.1 kHz, stereo
    val at = len - 128
    b(at) = 'T'; b(at + 1) = 'A'; b(at + 2) = 'G'
    val m = Mp3Frames.decode(b).getOrElse(fail("falsely truncated"))
    assert(m.frames.size == 1 && !m.id3v1)
    // and a REAL trailer on the same frame still reads as one
    val tag = new Array[Byte](128)
    tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
    val m2 = Mp3Frames.decode(b ++ tag).getOrElse(fail("real trailer"))
    assert(m2.frames.size == 1 && m2.id3v1)
  }

  test("damage grid: truncation, the lying bitrate index, the flipped CRC") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L, 26L, 33L, 40L))
      assert(Mp3Frames.decode(Mp3Sim.payloadFor(docId)).isEmpty,
        s"doc $docId should quarantine")
  }

  test("every mid-frame truncation quarantines; frame boundaries are honest prefixes") {
    // an MP3 stream is a self-delimiting concatenation: a cut exactly
    // at a frame boundary IS a valid shorter stream (no trailer field
    // exists to say otherwise), so the sweep asserts quarantine for
    // every NON-boundary cut and valid-with-fewer-frames at boundaries
    val docId = 1L // no tags: 1 % 4 != 0, 1 % 6 != 0
    val clean = Mp3Sim.payloadFor(docId)
    val bounds = (1 to Mp3Sim.nFrames(docId))
      .map(k => (0 until k).map(Mp3Sim.frameLen(docId, _)).sum).toSet
    (1 until clean.length).foreach { keep =>
      val got = Mp3Frames.decode(java.util.Arrays.copyOf(clean, keep))
      if (bounds.contains(keep))
        assert(got.exists(_.frames.nonEmpty), s"boundary cut at $keep")
      else
        assert(got.isEmpty, s"truncation to $keep bytes must quarantine")
    }
  }

  test("rejection grid: reserved fields, spliced streams, unsyncsafe tags") {
    val clean = Mp3Sim.payloadFor(1L) // no id3v2 (1 % 4 != 0)
    // reserved version bits (MPEG2.5 marker 00 on byte 1 bits 4-3)
    val v = clean.clone(); v(1) = (v(1) & ~0x18).toByte
    assert(Mp3Frames.decode(v).isEmpty)
    // layer I (bits 10) is out of scope
    val l = clean.clone(); l(1) = ((l(1) & ~0x06) | 0x06).toByte
    assert(Mp3Frames.decode(l).isEmpty)
    // forbidden bitrate index 15
    val b15 = clean.clone(); b15(2) = (b15(2) | 0xF0).toByte
    assert(Mp3Frames.decode(b15).isEmpty)
    // reserved samplerate
    val sr = clean.clone(); sr(2) = (sr(2) | 0x0C).toByte
    assert(Mp3Frames.decode(sr).isEmpty)
    // a SPLICED stream: two clean docs at different samplerates can't
    // be synthesized from the sim (it pins 44.1k), so splice by
    // rewriting frame 2's samplerate — the walk must reject the
    // mid-stream rate change even though the header is self-valid
    // (done via the sr case above at frame 0; here the emphasis rule)
    val em = clean.clone(); em(3) = ((em(3) & ~0x03) | 0x02).toByte
    assert(Mp3Frames.decode(em).isEmpty)
    // ID3v2 with an unsyncsafe size byte (high bit set)
    val withTag = Mp3Sim.payloadFor(4L) // 4 % 4 == 0 → has ID3v2
    assert(Mp3Frames.decode(withTag).nonEmpty)
    val bad = withTag.clone(); bad(6) = (bad(6) | 0x80).toByte
    assert(Mp3Frames.decode(bad).isEmpty)
  }

  test("crc16 is the 11172-3 polynomial (known vector)") {
    // CRC-16/IBM-like with init 0xFFFF over "123456789" = 0xAEE7
    val v = "123456789".getBytes("US-ASCII")
    assert(Mp3Frames.crc16(v, 0, v.length) == 0xAEE7)
  }
}
