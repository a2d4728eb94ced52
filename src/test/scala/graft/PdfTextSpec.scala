package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PdfSim, PdfText}

/** d163: PDF text extraction — build∘extract identity over the sim
  * corpus, the xref/object/stream strictness inventory, the damage
  * grid and the truncation sweep. */
class PdfTextSpec extends AnyFunSuite {

  private val TEXT =
    "Par(en)s, back\\slashes, newlines\nand tabs\t — über 試験 %PDF %%EOF " * 6

  private def utf8(s: String) = s.getBytes("UTF-8")

  test("roundtrip: extraction equals the doc bytes for every page count") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L, 15L, 16L, 18L, 20L)) {
      if (docId % 7 != 0 && docId % 7 != 3 && docId % 7 != 5) {
        val x = PdfText.extract(PdfSim.build(docId, TEXT)).get
        assert(x.nPages == (1 + docId % 4).toInt, s"doc $docId pages")
        assert(x.nObjects == 3 + 2 * x.nPages)
        assert(x.nTextOps == 2 * x.nPages)
        assert(java.util.Arrays.equals(x.textBytes, utf8(TEXT)),
          s"doc $docId text bytes")
        assert(x.kernSum ==
          (0 until x.nPages).map(i => -(100 + (docId + i) % 50)).sum)
      }
    }
    // empty text still extracts (empty strings are legal literals)
    val e = PdfText.extract(PdfSim.build(2L, "")).get
    assert(e.textBytes.isEmpty && e.nTextOps == 2 * e.nPages)
  }

  test("damage grid: truncation, the lying xref offset, the lying /Length") {
    for (docId <- Seq(0L, 7L, 14L, 21L, 3L, 10L, 17L, 24L, 5L, 12L, 19L, 26L))
      assert(PdfText.extract(PdfSim.payloadFor(docId, TEXT)).isEmpty,
        s"doc $docId should quarantine")
    // and the clean residues decode
    for (docId <- Seq(1L, 2L, 4L, 6L))
      assert(PdfText.extract(PdfSim.payloadFor(docId, TEXT)).nonEmpty)
  }

  test("truncation sweep: every cut before the %%EOF anchor quarantines") {
    val clean = PdfSim.build(2L, TEXT.take(120))
    // cutting ONLY the final EOL leaves a complete PDF (%%EOF intact) —
    // the documented honest boundary, like mp3's frame-boundary cuts
    val lastComplete = clean.length - 1
    assert(PdfText.extract(
      java.util.Arrays.copyOf(clean, lastComplete)).nonEmpty)
    (1 until lastComplete).foreach { keep =>
      assert(PdfText.extract(java.util.Arrays.copyOf(clean, keep)).isEmpty,
        s"truncation to $keep")
    }
    // appended whitespace is legal; any other trailing byte is not
    assert(PdfText.extract(clean :+ '\n'.toByte).nonEmpty)
    assert(PdfText.extract(clean :+ 'x'.toByte).isEmpty)
  }

  test("literal-string escapes: the full set decodes; hex strings too") {
    // hand-built one-page doc exercising \ooo, \t, \b, \f, nested
    // parens, backslash-EOL continuation and a hex string — grammar
    // paths the sim never emits
    val content = "BT /F1 12 Tf 72 720 Td " +
      "(\\101\\102\\103 \\t\\b\\f (nested (deep)) a\\\nb) Tj " +
      "0 -14 Td [<414243> -7 (x)] TJ ET"
    val pdf = handBuild(content)
    val x = PdfText.extract(pdf).get
    assert(new String(x.textBytes, "ISO-8859-1") ==
      "ABC \t\b\f (nested (deep)) ab" + "ABC" + "x")
    assert(x.kernSum == -7 && x.nTextOps == 2)
  }

  test("strictness: out-of-scope operators, unbalanced BT/ET, bad operands") {
    // an operator outside the scoped set quarantines
    assert(PdfText.extract(handBuild(
      "BT /F1 12 Tf (a) Tj ET q")).isEmpty)
    // Tj outside BT..ET
    assert(PdfText.extract(handBuild("(a) Tj")).isEmpty)
    // unbalanced BT
    assert(PdfText.extract(handBuild("BT (a) Tj")).isEmpty)
    // Tj with a number operand
    assert(PdfText.extract(handBuild("BT 5 Tj ET")).isEmpty)
    // TJ with a name inside the array
    assert(PdfText.extract(handBuild("BT [(a) /x] TJ ET")).isEmpty)
    // leftover operands at page end
    assert(PdfText.extract(handBuild("BT (a) Tj (b) ET")).isEmpty)
    // the minimal clean shape decodes
    assert(PdfText.extract(handBuild("BT (a) Tj ET")).nonEmpty)
    // a name with a non-hex #xx escape quarantines (Option contract),
    // never throws — /A#G1 has 'G' where a hex digit must be
    assert(PdfText.extract(handBuild("BT /A#G1 12 Tf (a) Tj ET")).isEmpty)
    // truncated escape at name end quarantines too
    assert(PdfText.extract(handBuild("BT /A#4 12 Tf (a) Tj ET")).isEmpty)
    // while a VALID #xx escape resolves (#46 = 'F')
    assert(PdfText.extract(handBuild("BT /#461 12 Tf (a) Tj ET")).nonEmpty)
  }

  test("graph strictness: count mismatch, wrong parent, missing root") {
    val good = handBuild("BT (a) Tj ET")
    assert(PdfText.extract(good).nonEmpty)
    // /Count lies (patch "Count 1" -> "Count 2"; same byte length)
    val lie = new String(good, "ISO-8859-1").replace("/Count 1", "/Count 2")
    assert(PdfText.extract(lie.getBytes("ISO-8859-1")).isEmpty)
    // generation 1 in the root reference quarantines (scope rule)
    val gen = new String(good, "ISO-8859-1").replace("/Root 1 0 R", "/Root 1 1 R")
    assert(PdfText.extract(gen.getBytes("ISO-8859-1")).isEmpty)
  }

  test("xref stream: roundtrip through the 1.5 structure (d166)") {
    import graft.operators.PdfXSim
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L, 15L, 16L, 18L, 20L)) {
      if (docId % 7 != 0 && docId % 7 != 3 && docId % 7 != 5) {
        val x = PdfText.extractXrefStream(PdfXSim.build(docId, TEXT)).get
        assert(x.nPages == (1 + docId % 4).toInt)
        assert(x.nObjects == 5 + 2 * x.nPages)
        assert(x.nCompressed == x.nPages + 3)
        assert(x.nTextOps == 2 * x.nPages)
        assert(java.util.Arrays.equals(x.textBytes, utf8(TEXT)),
          s"doc $docId text bytes")
        assert(x.kernSum ==
          (0 until x.nPages).map(i => -(100 + (docId + i) % 50)).sum)
      }
    }
    // the flavors don't cross-accept: each quarantines the other's
    // anchor (scope rule)
    assert(PdfText.extract(PdfXSim.build(2L, TEXT)).isEmpty)
    assert(PdfText.extractXrefStream(PdfSim.build(2L, TEXT)).isEmpty)
  }

  test("xref stream damage grid: truncation, the lying index, the lying /W") {
    import graft.operators.PdfXSim
    for (docId <- Seq(0L, 7L, 14L, 21L, 3L, 10L, 17L, 24L, 5L, 12L, 19L, 26L))
      assert(PdfText.extractXrefStream(PdfXSim.payloadFor(docId, TEXT)).isEmpty,
        s"doc $docId should quarantine")
    for (docId <- Seq(1L, 2L, 4L, 6L))
      assert(PdfText.extractXrefStream(PdfXSim.payloadFor(docId, TEXT)).nonEmpty)
  }

  test("xref stream truncation sweep (sampled) quarantines before the anchor") {
    import graft.operators.PdfXSim
    val clean = PdfXSim.build(2L, TEXT.take(120))
    assert(PdfText.extractXrefStream(
      java.util.Arrays.copyOf(clean, clean.length - 1)).nonEmpty)
    // dense sweep over the structural tail (xref stream + trailer) +
    // a stride through the body
    val lastComplete = clean.length - 1
    ((1 until lastComplete by 7) ++ (lastComplete - 400 until lastComplete))
      .foreach { keep =>
        assert(PdfText.extractXrefStream(
          java.util.Arrays.copyOf(clean, keep)).isEmpty,
          s"truncation to $keep")
      }
  }

  /** Minimal single-page PDF around a given (uncompressed) content
    * string, Flate-encoded, with a correct xref — the harness for the
    * grammar tests above. */
  private def handBuild(content: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("UTF-8"))
    val offs = new Array[Int](6)
    w("%PDF-1.4\n")
    offs(1) = out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offs(2) = out.size(); w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offs(3) = out.size(); w("3 0 obj\n<< /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n")
    val flate = graft.operators.DeflateCodec.zlibEncode(
      content.getBytes("UTF-8"), 1 << 16)
    offs(4) = out.size()
    w(s"4 0 obj\n<< /Length ${flate.length} /Filter /FlateDecode >>\nstream\n")
    out.write(flate)
    w("\nendstream\nendobj\n")
    offs(5) = out.size()
    w("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xrefAt = out.size()
    w("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(o => w(f"${offs(o)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xrefAt\n" + "%%EOF\n")
    out.toByteArray
  }
}
