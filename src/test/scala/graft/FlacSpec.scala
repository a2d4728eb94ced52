package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** d147: FLAC — encode∘decode identity on arbitrary waveforms, the
  * rice/predictor/CRC grammar, the MD5 and total-count audits, and
  * the damage classes. */
class FlacSpec extends AnyFunSuite {

  test("roundtrip identity on the gate waveform, fixed and LPC paths") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L, 305L)) {
      val want = FlacSim.samplesFor(docId)
      val info = FlacCodec.decode(FlacSim.payloadFor(docId))
        .getOrElse(fail(s"doc $docId quarantined"))
      assert(info.samples.toSeq == want.toSeq)
      assert(info.nFrames == (want.length + 575) / 576)
      assert(info.sampleRate == 16000)
    }
  }

  test("roundtrip identity on arbitrary waveforms (constant, ramps, noise, tiny tails)") {
    val rnd = new scala.util.Random(147)
    (0 until 30).foreach { trial =>
      val n = 1 + rnd.nextInt(2000)
      val samples = trial % 5 match {
        case 0 => Array.fill(n)(rnd.nextInt(65536) - 32768) // white noise
        case 1 => Array.fill(n)(-7) // constant
        case 2 => Array.tabulate(n)(i => (i * 3 - 1000).max(-32768).min(32767))
        case 3 => Array.tabulate(n)(i =>
          (8000 * math.sin(i / 17.0)).toInt) // smooth: order-2 wins
        case _ => Array.tabulate(n)(i => if (i % 7 == 0) rnd.nextInt(200) else 0)
      }
      val lpc = rnd.nextBoolean()
      val info = FlacCodec.decode(FlacCodec.encode(samples, lpc))
        .getOrElse(fail(s"trial $trial quarantined (n=$n lpc=$lpc)"))
      assert(info.samples.toSeq == samples.toSeq, s"trial $trial diverges")
    }
    // the extremes fit the declared depth
    val edge = Array(32767, -32768, 0, 32767, -32768, 1, -1)
    assert(FlacCodec.decode(FlacCodec.encode(edge, lpc = false))
      .get.samples.toSeq == edge.toSeq)
  }

  test("damage classes: truncation, the lying MD5, the lying total count") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L))
      assert(FlacCodec.decode(FlacSim.payloadFor(docId)).isEmpty,
        s"doc $docId should quarantine")
  }

  test("every truncation quarantines; no flip silently corrupts samples") {
    val samples = FlacSim.samplesFor(1L).take(600)
    val bytes = FlacCodec.encode(samples, lpc = false)
    Seq(0, 3, 4, 20, 41, 42, 100, bytes.length / 2, bytes.length - 1)
      .foreach { cut =>
        assert(FlacCodec.decode(java.util.Arrays.copyOf(bytes, cut)).isEmpty)
      }
    // frames are CRC-covered and the samples MD5-covered: a flip in
    // the frame region must quarantine; a flip in STREAMINFO's
    // unprotected advisory fields (the format carries no metadata
    // checksum — an honest property of FLAC) may decode, but can
    // never change a sample
    (0 until bytes.length by 2).foreach { i =>
      val bad = bytes.clone()
      bad(i) = (bad(i) ^ 0x10).toByte
      FlacCodec.decode(bad) match {
        case None =>
        case Some(info) =>
          assert(i >= 8 && i < 42, s"frame-region flip at $i survived")
          assert(info.samples.toSeq == samples.toSeq,
            s"flip at $i silently changed samples")
      }
    }
  }

  test("grammar strictness: wasted bits, reserved subframes, out-of-order frames refuse") {
    // the clean stream decodes; surgical header edits must not
    val samples = Array.tabulate(700)(i => (i % 100) - 50)
    val clean = FlacCodec.encode(samples, lpc = false)
    assert(FlacCodec.decode(clean).isDefined)
    // STREAMINFO: non-mono channel count (byte 4+4+18 = offset into
    // streaminfo bits 132..135 → byte 16 of the 34) — flip the
    // channels field and the scope check must refuse, not guess
    val bad = clean.clone()
    bad(8 + 16) = (bad(8 + 16) ^ 0x0E).toByte
    assert(FlacCodec.decode(bad).isEmpty)
  }

  test("the CRC polynomials match the published spec vectors") {
    // CRC-8 poly 0x07 over "123456789" = 0xF4; CRC-16 poly 0x8005
    // (unreflected, init 0) over the same = 0xFEE8 — the classic
    // check-value pair for these generators
    val v = "123456789".getBytes("US-ASCII")
    assert(FlacCodec.crc8(v, 0, v.length) == 0xF4)
    assert(FlacCodec.crc16(v, 0, v.length) == 0xFEE8)
  }
}
