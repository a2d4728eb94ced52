package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Hdf5, Hdf5Sim}

/** d172: the HDF5 walker — lookup3 pinned to the published vectors,
  * closed-form roundtrip through BOTH superblock lineages, the damage
  * grid, the every-prefix truncation property (the EOF-address audit
  * makes it total: hdf5 has no trailer, the superblock's eof IS the
  * integrity tell), and metadata bit-flip coverage. Self-pinned (no
  * independent HDF5 implementation exists on this host — the
  * d147/d167 precedent), with the spec-fidelity anchors that are
  * possible: the public lookup3 test vectors and the spec's own
  * structure sizes. */
class Hdf5Spec extends AnyFunSuite {

  test("lookup3 matches the published lookup3.c vectors") {
    // from Bob Jenkins' lookup3.c (public domain, May 2006):
    //   hashlittle("", 0) = 0xdeadbeef
    //   hashlittle("Four score and seven years ago", 0) = 0x17770551
    //   hashlittle("Four score and seven years ago", 1) = 0xcd628161
    assert(Hdf5.lookup3(Array.empty[Byte], 0, 0, 0) == 0xdeadbeef)
    val s = "Four score and seven years ago".getBytes("US-ASCII")
    assert(Hdf5.lookup3(s, 0, s.length, 0) == 0x17770551)
    assert(Hdf5.lookup3(s, 0, s.length, 1) == 0xcd628161)
  }

  test("roundtrip: clean docs replay the closed form (both superblocks, both layouts)") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L, 15L, 16L)) {
      val info = Hdf5.read(Hdf5Sim.payloadFor(docId))
        .getOrElse(fail(s"doc $docId quarantined"))
      val kk = Hdf5Sim.k(docId)
      assert(info.superVersion == (if (docId % 2 == 1) 2 else 0))
      assert(info.nDatasets == 2)
      assert(info.nIds == kk.toLong)
      assert(info.sumIds == (0 until kk).map(Hdf5Sim.idVal(docId, _)).sum)
      assert(info.nFeats == kk.toLong * 4)
      val want = (for (r <- 0 until kk; c <- 0 until 4)
        yield Hdf5Sim.featVal(docId, r, c).toDouble).sum
      assert(info.sumFeats == want, "quarter-float sums are exact")
    }
  }

  test("damage grid: truncation, the lying dataspace, the swapped chunk keys") {
    for (docId <- Seq(0L, 7L, 14L, 21L, 3L, 10L, 17L, 24L, 5L, 12L, 19L, 26L))
      assert(Hdf5.read(Hdf5Sim.payloadFor(docId)).isEmpty,
        s"doc $docId should quarantine")
  }

  test("every truncation quarantines: the EOF-address audit is total") {
    for (docId <- Seq(1L, 2L)) { // one v2, one v0
      val clean = Hdf5Sim.payloadFor(docId)
      (1 until clean.length).foreach { keep =>
        assert(Hdf5.read(java.util.Arrays.copyOf(clean, keep)).isEmpty,
          s"doc $docId truncated to $keep bytes must quarantine")
      }
      // appended bytes too: eof no longer matches
      assert(Hdf5.read(clean :+ 0.toByte).isEmpty)
    }
  }

  test("metadata flips: superblock and object-header bytes are checksum/audit-covered") {
    // v2 lineage: the superblock checksum + OHDR checksums cover the
    // metadata prefix — every flip there must quarantine
    val v2 = Hdf5Sim.payloadFor(1L)
    (8 until 47).foreach { i => // superblock fields + checksum
      val bad = v2.clone(); bad(i) = (bad(i) ^ 0x10).toByte
      assert(Hdf5.read(bad).isEmpty, s"v2 superblock flip at $i slipped through")
    }
    // v0 lineage: no checksums by design (spec-true) — but the
    // structural audits still catch the load-bearing fields: flips in
    // the superblock's size/eof region quarantine
    val v0 = Hdf5Sim.payloadFor(2L)
    (40 until 48).foreach { i => // the EOF address bytes
      val bad = v0.clone(); bad(i) = (bad(i) ^ 0x01).toByte
      assert(Hdf5.read(bad).isEmpty, s"v0 eof flip at $i slipped through")
    }
  }

  test("the deflate filter pipeline rotates in and decodes through our d124 inflate") {
    // docs with docId%3==0 write the feats chunks zlib-compressed;
    // sums must be identical either way (same closed form)
    val plain = Hdf5.read(Hdf5Sim.payloadFor(1L)).get // 1 % 3 != 0
    val defl = Hdf5.read(Hdf5Sim.payloadFor(6L)).get // 6 % 3 == 0
    assert(plain.nFeats > 0 && defl.nFeats > 0)
    val want6 = (for (r <- 0 until Hdf5Sim.k(6L); c <- 0 until 4)
      yield Hdf5Sim.featVal(6L, r, c).toDouble).sum
    assert(defl.sumFeats == want6)
  }
}
