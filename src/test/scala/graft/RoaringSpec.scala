package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** d140: the roaring portable format — container canonical forms, the
  * cardinality/offset audits, the damage classes, and interop BOTH
  * directions (plus byte-identity) against org.roaringbitmap. */
class RoaringSpec extends AnyFunSuite {

  test("roundtrip identity across all three container types") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L, 16L, 22L)) {
      val vals = RoaringSim.valuesFor(docId)
      val (nc, back) = Roaring.decode(Roaring.encode(vals)).get
      assert(nc == 4)
      assert(back.toSeq == vals.toSeq)
    }
  }

  test("random sets roundtrip (sparse, dense, runs, container boundaries)") {
    val rnd = new scala.util.Random(140)
    (0 until 30).foreach { _ =>
      val vals = scala.collection.mutable.SortedSet[Int]()
      // sparse scatter
      (0 until rnd.nextInt(200)).foreach(_ => vals += rnd.nextInt(1 << 20))
      // a dense run
      val s = rnd.nextInt(60000)
      (s until math.min(65536, s + rnd.nextInt(3000))).foreach(vals += _)
      // a bitmap-density chunk just past the array bound
      if (rnd.nextBoolean()) {
        val base = 2 << 16
        (0 until 4097).foreach(i => vals += base + 2 * i)
      }
      val arr = vals.toArray
      val (_, back) = Roaring.decode(Roaring.encode(arr)).get
      assert(back.toSeq == arr.toSeq)
    }
    // the empty bitmap is legal
    val (nc0, v0) = Roaring.decode(Roaring.encode(Array.empty[Int])).get
    assert(nc0 == 0 && v0.isEmpty)
  }

  test("damage classes: truncation, the lying run cardinality, the lying offset") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L))
      assert(Roaring.decode(RoaringSim.bytesFor(docId)).isEmpty,
        s"doc $docId should quarantine")
    // the lies are metadata-only: the same set without them decodes
    for (docId <- Seq(3L, 5L, 10L, 12L))
      assert(Roaring.decode(Roaring.encode(RoaringSim.valuesFor(docId))).isDefined)
  }

  test("every truncation quarantines; canonical-form violations rejected") {
    val bytes = Roaring.encode(RoaringSim.valuesFor(1L))
    (0 until bytes.length).foreach { cut =>
      assert(Roaring.decode(java.util.Arrays.copyOf(bytes, cut)).isEmpty)
    }
    assert(Roaring.decode(bytes :+ 0.toByte).isEmpty) // trailing bytes
    // an unsorted array container: keys fine, values swapped
    val small = Roaring.encode(Array(5, 9, 12))
    val swapped = small.clone()
    // no-run cookie: 4 cookie + 4 size + 4 descr + 4 offsets = values at 16
    val t = swapped(16); swapped(16) = swapped(18); swapped(18) = t
    assert(Roaring.decode(swapped).isEmpty)
  }

  import org.roaringbitmap.RoaringBitmap

  private def javaBytes(vals: Array[Int]): Array[Byte] = {
    val rb = new RoaringBitmap()
    vals.foreach(rb.add)
    rb.runOptimize()
    val bb = java.nio.ByteBuffer.allocate(rb.serializedSizeInBytes())
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    rb.serialize(bb)
    bb.array()
  }

  test("interop 1: org.roaringbitmap bytes walk through our reader with the audits ON") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 13L)) {
      val vals = RoaringSim.valuesFor(docId)
      val (nc, back) = Roaring.decode(javaBytes(vals))
        .getOrElse(fail(s"real roaring bytes quarantined (doc $docId)"))
      assert(nc == 4)
      assert(back.toSeq == vals.toSeq)
    }
    // and a no-run-cookie shape (nothing run-optimal)
    val sparse = Array(1, 40, 70000, 131073)
    assert(Roaring.decode(javaBytes(sparse)).get._2.toSeq == sparse.toSeq)
  }

  test("interop 2: our bytes deserialize through org.roaringbitmap set-identical") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 13L)) {
      val vals = RoaringSim.valuesFor(docId)
      val rb = new RoaringBitmap()
      rb.deserialize(java.nio.ByteBuffer.wrap(Roaring.encode(vals))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN))
      assert(rb.toArray.toSeq == vals.toSeq)
    }
  }

  test("byte identity: our writer and runOptimized org.roaringbitmap agree byte-for-byte") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val vals = RoaringSim.valuesFor(docId)
      assert(java.util.Arrays.equals(Roaring.encode(vals), javaBytes(vals)),
        s"doc $docId bytes diverge")
    }
  }
}
