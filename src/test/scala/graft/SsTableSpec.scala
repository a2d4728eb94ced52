package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** d145: the LevelDB SSTable layout — block grammar, restart
  * invariants, the masked crc32c, the handle-tiling and sort audits,
  * point lookups, and the damage classes. */
class SsTableSpec extends AnyFunSuite {

  test("roundtrip: tables walk back entry-identical, both codec paths") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val t = SsTableCodec.read(SsTableSim.tableFor(docId))
        .getOrElse(fail(s"doc $docId quarantined"))
      val all = t.blocks.flatten
      assert(all.size == SsTableSim.k(docId))
      all.zipWithIndex.foreach { case ((k, v), i) =>
        assert(k.toSeq == SsTableSim.keyFor(docId, i).toSeq)
        assert(v.toSeq == SsTableSim.valueFor(docId, i).toSeq)
      }
      assert(t.blocks.size == (SsTableSim.k(docId) + 2) / 3)
    }
  }

  test("point lookups: the index path finds present keys and rejects absent ones") {
    val t = SsTableCodec.read(SsTableSim.tableFor(8L)).get
    (0 until SsTableSim.k(8L)).foreach { i =>
      assert(SsTableCodec.get(t, SsTableSim.keyFor(8L, i))
        .exists(_.toSeq == SsTableSim.valueFor(8L, i).toSeq))
    }
    assert(SsTableCodec.get(t, "doc/000000008/chunk99".getBytes).isEmpty)
    assert(SsTableCodec.get(t, "aaa".getBytes).isEmpty)
    assert(SsTableCodec.get(t, "zzz".getBytes).isEmpty)
  }

  test("damage classes: truncation, the lying index handle, the swapped keys") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L))
      assert(SsTableCodec.read(SsTableSim.tableFor(docId)).isEmpty,
        s"doc $docId should quarantine")
  }

  test("every truncation and every flipped byte quarantines (crc + audits)") {
    val bytes = SsTableSim.tableFor(1L)
    Seq(0, 7, 47, bytes.length / 3, bytes.length / 2, bytes.length - 9,
      bytes.length - 1).foreach { cut =>
      assert(SsTableCodec.read(java.util.Arrays.copyOf(bytes, cut)).isEmpty)
    }
    (0 until bytes.length by 3).foreach { i =>
      val bad = bytes.clone()
      bad(i) = (bad(i) ^ 0x08).toByte
      assert(SsTableCodec.read(bad).isEmpty, s"flip at $i survived")
    }
  }

  test("block grammar: restart invariants enforced") {
    // a hand-built block whose restart array points past the entries
    def block(entries: Seq[(String, String)], restarts: Seq[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream
      entries.foreach { case (k, v) =>
        out.write(0); out.write(k.length); out.write(v.length)
        out.write(k.getBytes); out.write(v.getBytes)
      }
      restarts.foreach { r =>
        out.write(r & 0xff); out.write((r >> 8) & 0xff)
        out.write((r >> 16) & 0xff); out.write((r >> 24) & 0xff)
      }
      val n = restarts.length
      out.write(n & 0xff); out.write((n >> 8) & 0xff)
      out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
      out.toByteArray
    }
    assert(SsTableCodec.parseBlock(
      block(Seq("a" -> "1", "b" -> "2"), Seq(0, 6))).size == 2)
    // first restart must be 0
    assertThrows[Throwable](SsTableCodec.parseBlock(
      block(Seq("a" -> "1", "b" -> "2"), Seq(6))))
    // unsorted entries
    assertThrows[Throwable](SsTableCodec.parseBlock(
      block(Seq("b" -> "1", "a" -> "2"), Seq(0, 6))))
    // duplicate key (strictly increasing required)
    assertThrows[Throwable](SsTableCodec.parseBlock(
      block(Seq("a" -> "1", "a" -> "2"), Seq(0, 6))))
    // zero restarts
    assertThrows[Throwable](SsTableCodec.parseBlock(
      block(Seq("a" -> "1"), Seq())))
  }

  test("the masked crc32c follows the published convention") {
    // mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8, over
    // contents + the type byte — recompute one by hand vs the helper
    val data = "leveldb block bytes".getBytes("US-ASCII")
    val c = new java.util.zip.CRC32C
    c.update(data, 0, data.length)
    c.update(1)
    val crc = c.getValue
    val want = (((crc >>> 15) | (crc << 17)) + 0xa282ead8L) & 0xFFFFFFFFL
    assert(SsTableCodec.maskedCrc(data, 1) == want)
    assert(SsTableCodec.maskedCrc(data, 0) != want) // the type byte counts
  }
}
