package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ParquetFile, ParquetPageIdxSim}

/** d175: the page-index audit — clean roundtrip, the three lie
  * classes, the boundary_order claim, and the negative control that
  * proves the audit ENGAGES (the same lies in a file without the
  * audit's tripwires pass the chunk-level checks). */
class ParquetPageIdxSpec extends AnyFunSuite {

  private def rowsFor(n: Int, seed: Long): Seq[(Long, Long, String)] =
    (0 until n).map(j => (seed * 1000 + j, (seed * 7 + j * 13) % 997,
      s"pg $seed/$j " + ("y" * (j % 11))))

  test("clean paged files walk; stats match the unpaged writer's") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val text = s"doc body $docId"
      val paged = ParquetFile.read(ParquetPageIdxSim.payloadFor(docId, text))
        .getOrElse(fail(s"doc $docId quarantined"))
      assert(paged.numRows == (3 + docId % 5))
      assert(paged.nPages > paged.nRowGroups * 3, "multiple pages per chunk")
    }
  }

  test("damage grid: truncation, the page-max lie, the first-row lie") {
    for (docId <- Seq(0L, 7L, 14L, 21L, 3L, 10L, 17L, 24L, 5L, 12L, 19L, 26L))
      assert(ParquetFile.read(
        ParquetPageIdxSim.payloadFor(docId, s"t$docId")).isEmpty,
        s"doc $docId should quarantine")
  }

  test("the page-max lie is INVISIBLE to chunk-level checks (why d175 exists)") {
    // same rows through the unpaged writer: chunk stats are true, and
    // without a page index there is nothing left to lie about — the
    // d126 walk passes. The lie lives strictly below chunk granularity.
    val rows = rowsFor(8, 3)
    assert(ParquetFile.read(ParquetFile.write(rows, 4, 0)).isDefined)
    val lied = ParquetFile.writePaged(rows, 4, 2, 0, liePageMax = true)
    assert(ParquetFile.read(lied).isEmpty, "the page-index audit must bite")
  }

  test("boundary_order: honest claims pass, the opposite claim quarantines") {
    val rows = rowsFor(8, 5)
    assert(ParquetFile.read(ParquetFile.writePaged(rows, 4, 2, 1)).isDefined)
    assert(ParquetFile.read(ParquetFile.writePaged(rows, 4, 2, 1,
      lieOrder = true)).isEmpty,
      "a false monotonicity claim must quarantine")
    // doc_id ascending pages: the honest ASCENDING claim verifies
    val asc = (0 until 8).map(j => (j.toLong, j.toLong * 2, s"t$j"))
    assert(ParquetFile.read(ParquetFile.writePaged(asc, 8, 2, 0)).isDefined)
  }

  test("every truncation of a paged file quarantines") {
    val clean = ParquetPageIdxSim.payloadFor(1L, "tx")
    (1 until clean.length).foreach { keep =>
      assert(ParquetFile.read(java.util.Arrays.copyOf(clean, keep)).isEmpty,
        s"truncated to $keep bytes must quarantine")
    }
  }
}
