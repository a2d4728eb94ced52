package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{XzCodec, XzJsonlSim}

/** d134: the from-scratch XZ/LZMA2 codec. Roundtrip pins across check
  * types and block counts, the damage classes, a bit-flip sweep with
  * zero tolerated silent corruptions, and the interop pin BOTH
  * directions against XZ for Java (org.tukaani.xz — the reference
  * implementation): its BT4 output (rep matches, cross-chunk state,
  * CRC64) decodes through our walker byte-exactly, and our writer's
  * files read back through XZInputStream. */
class XzLzmaSpec extends AnyFunSuite {

  private val rnd = new java.util.Random(7)
  private val big = ("lorem ipsum dolor sit amet " * 5000).getBytes("UTF-8")

  test("roundtrip: text / random / empty / near-incompressible, 1-3 blocks, all check types") {
    val texts = Seq(
      "hello world hello world hello hello hello".getBytes("UTF-8"),
      ("the quick brown fox jumps over the lazy dog " * 200).getBytes("UTF-8"),
      Array.empty[Byte],
      Array.fill(100000)((rnd.nextInt(4) + 'a').toByte),
      Array.fill(5000)(rnd.nextInt(256).toByte),
      "πéü𝄞 ünïcödé".getBytes("UTF-8"))
    for ((t, i) <- texts.zipWithIndex; nb <- Seq(1, 2, 3); ct <- Seq(0, 1, 4)) {
      if (t.length >= nb) {
        val dec = XzCodec.decode(XzCodec.encode(t, nb, ct))
        assert(dec.nonEmpty, s"text $i nb=$nb ct=$ct quarantined clean")
        assert(java.util.Arrays.equals(dec.get._1, t), s"text $i nb=$nb ct=$ct bytes")
        assert(dec.get._2 == nb)
      }
    }
    // the encoder genuinely compresses (greedy matches, not a stub)
    assert(XzCodec.encode(big, 1, 1).length < big.length / 20)
  }

  test("interop 1: XZ for Java reads our writer's files") {
    for (ct <- Seq(1, 4); nb <- Seq(1, 2)) {
      val in = new org.tukaani.xz.XZInputStream(
        new java.io.ByteArrayInputStream(XzCodec.encode(big, nb, ct)))
      assert(java.util.Arrays.equals(in.readAllBytes(), big),
        s"tukaani reading ours ct=$ct nb=$nb")
    }
  }

  test("interop 2: our walker decodes tukaani's real BT4 output (presets 0/3/6)") {
    for (preset <- Seq(0, 3, 6); data <- Seq(big,
        Array.fill(60000)(rnd.nextInt(256).toByte),
        ("ab" * 30000).getBytes("UTF-8"))) {
      val bo = new java.io.ByteArrayOutputStream()
      val xo = new org.tukaani.xz.XZOutputStream(bo,
        new org.tukaani.xz.LZMA2Options(preset))
      xo.write(data); xo.close()
      val dec = XzCodec.decode(bo.toByteArray)
      assert(dec.nonEmpty, s"preset $preset len ${data.length}: quarantined a tukaani file")
      assert(java.util.Arrays.equals(dec.get._1, data), s"preset $preset: bytes differ")
    }
  }

  test("damage classes: truncation, the lying index, the flipped data check all quarantine") {
    val text = "line one\nline two with words\nline three πé\nline four"
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val dec = XzCodec.decode(XzJsonlSim.payloadFor(docId, text))
      assert(dec.nonEmpty, s"doc $docId clean quarantined")
      assert(dec.get._2 == XzJsonlSim.nBlocks(docId))
      assert(java.util.Arrays.equals(dec.get._1, XzJsonlSim.jsonlBytes(docId, text)))
    }
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L))
      assert(XzCodec.decode(XzJsonlSim.payloadFor(docId, text)).isEmpty,
        s"doc $docId class ${docId % 7} must quarantine")
  }

  test("bit-flip sweep: every flip quarantines or decodes identically (zero silent corruptions)") {
    val want = "abcabcabc test test".getBytes("UTF-8")
    val small = XzCodec.encode(want, 1, 4)
    var silent = 0
    for (bit <- 0 until small.length * 8) {
      val mut = small.clone()
      mut(bit / 8) = (mut(bit / 8) ^ (1 << (bit % 8))).toByte
      XzCodec.decode(mut).foreach { case (bytes, _) =>
        if (!java.util.Arrays.equals(bytes, want)) silent += 1
      }
    }
    assert(silent == 0, s"$silent silent corruptions")
  }

  test("every-prefix truncation quarantines (the footer makes no valid cut)") {
    val enc = XzCodec.encode("some text to pack".getBytes("UTF-8"), 1, 1)
    for (cut <- 0 until enc.length)
      assert(XzCodec.decode(java.util.Arrays.copyOf(enc, cut)).isEmpty,
        s"prefix $cut must quarantine")
  }
}
