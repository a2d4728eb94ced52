package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Gguf, GgufSim}

/** d159: GGUF — framing, typed metadata, the tensor tiling audits,
  * binary16 conversion vectors, the damage grid, and the truncation
  * sweep. No GGUF implementation exists in this container, so the pin
  * is encode∘decode identity plus the spec's own rejection grid (the
  * d153 discipline). */
class GgufSpec extends AnyFunSuite {

  test("roundtrip: metadata values and all three tensor kinds survive") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val m = Gguf.decode(GgufSim.payloadFor(docId, nChars = 1234 + docId))
        .getOrElse(fail(s"doc $docId quarantined"))
      assert(m.kv.size == 6)
      assert(m.kv.collectFirst { case ("general.name", Gguf.MStr(s)) => s }
        .contains(s"doc$docId"))
      assert(m.kv.collectFirst { case ("doc.n_chars", Gguf.MInt(v)) => v }
        .contains(1234 + docId))
      assert(m.kv.collectFirst { case ("doc.flag", Gguf.MBool(b)) => b }
        .contains(docId % 2 == 0))
      assert(m.kv.collectFirst { case ("doc.tags", Gguf.MArr(es)) => es.size }
        .contains(2))
      assert(m.tensors.size == GgufSim.kTensors(docId))
      assert(m.alignment == 32)
      // every tensor's values decode to exactly what the sim planted
      m.tensors.zipWithIndex.foreach { case (t, ti) =>
        ((docId + ti) % 3).toInt match {
          case 0 =>
            val vs = Gguf.f32(t, m.data)
            vs.zipWithIndex.foreach { case (v, i) =>
              assert(v == (((docId + ti * 31 + i) % 64) * 0.25).toFloat)
            }
          case 1 =>
            val vs = Gguf.f16(t, m.data)
            vs.zipWithIndex.foreach { case (v, i) =>
              assert(v == (((docId + ti + i) % 32) * 0.5).toFloat)
            }
          case _ =>
            val (scales, quants) = Gguf.q8Blocks(t, m.data)
            assert(scales.forall(_ == 0.5f))
            quants.zipWithIndex.foreach { case (q, j) =>
              assert(q == (((docId * 7 + ti * 13 + j) % 255) - 127).toByte)
            }
        }
      }
    }
  }

  test("general.alignment encodes as u32 (the type gguf.md pins)") {
    // interop check, not just round-trip: llama.cpp type-checks this
    // key, so the encoder must emit type id 4 (u32) + 4 value bytes
    // even though our lenient decoder would accept u64 too
    val key = "general.alignment"
    val enc = Gguf.encode(Seq(key -> Gguf.MInt(32L)), Seq.empty)
    val tyAt = 4 + 4 + 8 + 8 + 8 + key.length // magic,ver,nT,nKv,keylen,key
    val ty = (enc(tyAt) & 0xFF) | ((enc(tyAt + 1) & 0xFF) << 8) |
      ((enc(tyAt + 2) & 0xFF) << 16) | ((enc(tyAt + 3) & 0xFF) << 24)
    assert(ty == 4, s"expected u32 type id 4, got $ty")
    val v = (enc(tyAt + 4) & 0xFF) | ((enc(tyAt + 5) & 0xFF) << 8) |
      ((enc(tyAt + 6) & 0xFF) << 16) | ((enc(tyAt + 7) & 0xFF) << 24)
    assert(v == 32)
    // and it still round-trips through the decoder
    assert(Gguf.decode(enc).exists(_.alignment == 32))
  }

  test("damage grid: truncation, the lying offset, the duplicate key") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L))
      assert(Gguf.decode(GgufSim.payloadFor(docId, 100L)).isEmpty,
        s"doc $docId should quarantine")
  }

  test("every truncation quarantines; a flipped data byte breaks the tiling or value audit") {
    val clean = GgufSim.payloadFor(1L, 100L)
    (1 until clean.length).foreach { keep =>
      assert(Gguf.decode(java.util.Arrays.copyOf(clean, keep)).isEmpty,
        s"truncation to $keep bytes must quarantine")
    }
  }

  test("rejection grid: version, bool byte, dup tensor name, padding discipline") {
    val clean = GgufSim.payloadFor(1L, 100L)
    // version 1 (the old u32-count layout) is out of scope
    val v1 = clean.clone(); v1(4) = 1
    assert(Gguf.decode(v1).isEmpty)
    // hand-built minimal file: one bool kv, zero tensors — a value
    // byte of 2 lies about being a bool and must quarantine
    def minimalBool(byte: Int): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream
      o.write('G'); o.write('G'); o.write('U'); o.write('F')
      o.write(Array[Byte](3, 0, 0, 0)) // version
      o.write(new Array[Byte](8)) // 0 tensors
      o.write(Array[Byte](1, 0, 0, 0, 0, 0, 0, 0)) // 1 kv
      o.write(Array[Byte](1, 0, 0, 0, 0, 0, 0, 0)) // key len 1
      o.write('k')
      o.write(Array[Byte](7, 0, 0, 0)) // type bool
      o.write(byte)
      // pad to the default 32 alignment (data section empty)
      while (o.size() % 32 != 0) o.write(0)
      o.toByteArray
    }
    assert(Gguf.decode(minimalBool(1)).nonEmpty)
    assert(Gguf.decode(minimalBool(2)).isEmpty, "bool byte 2 must quarantine")
    // duplicate tensor names: two identical infos through the encoder
    val t = GgufSim.tensorFor(1L, 0)
    val dup = Gguf.encode(Seq("general.alignment" -> Gguf.MInt(32L)),
      Seq(t, t.copy()))
    assert(Gguf.decode(dup).isEmpty, "duplicate tensor name must quarantine")
    // nonzero padding byte between header and data = smuggled payload
    val mm = Gguf.decode(clean).get
    val dataStart = clean.length - mm.data.length
    if (dataStart > 0 && clean(dataStart - 1) == 0) {
      val pad = clean.clone(); pad(dataStart - 1) = 0x55
      assert(Gguf.decode(pad).isEmpty, "nonzero header padding must quarantine")
    }
  }

  test("binary16 conversion vectors (both directions)") {
    val vectors = Seq(
      0.0f -> 0x0000, 0.5f -> 0x3800, 0.25f -> 0x3400, 1.0f -> 0x3C00,
      1.5f -> 0x3E00, 2.0f -> 0x4000, -2.5f -> 0xC100, 65504.0f -> 0x7BFF,
      -0.0f -> 0x8000, 15.5f -> 0x4BC0)
    vectors.foreach { case (f, h) =>
      assert(Gguf.floatToF16(f) == h, f"encode $f → ${Gguf.floatToF16(f)}%04x != $h%04x")
      assert(Gguf.f16ToFloat(h) == f, f"decode $h%04x")
    }
    // every exact half in the sim's range survives the roundtrip
    (0 until 32).foreach { i =>
      val v = (i * 0.5).toFloat
      assert(Gguf.f16ToFloat(Gguf.floatToF16(v)) == v)
    }
  }
}
