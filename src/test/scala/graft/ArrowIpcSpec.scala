package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._
import graft.operators.ArrowIpc._

/** d139: the Arrow IPC stream walk — flatbuffers from scratch, the
  * framing grammar, the null_count / utf8-offset audits, the damage
  * classes, and interop BOTH directions against arrow-vector (the
  * library Spark itself ships columns through). */
class ArrowIpcSpec extends AnyFunSuite {

  private def mkBatch(rows: Seq[(Option[Long], Option[Double], Option[String])])
      : ABatch = {
    val n = rows.size
    val iv = rows.map(_._1.isDefined).toArray
    val il = rows.map(_._1.getOrElse(0L)).toArray
    val vv = rows.map(_._2.isDefined).toArray
    val vd = rows.map(_._2.getOrElse(0.0)).toArray
    val tv = rows.map(_._3.isDefined).toArray
    val ts = rows.map(_._3.orNull).toArray
    ABatch(n, Seq(ACol(iv, il, null, null), ACol(vv, null, vd, null),
      ACol(tv, null, null, ts)))
  }

  private def flatten(bs: Seq[ABatch])
      : Seq[(Option[Long], Option[Double], Option[String])] =
    bs.flatMap { b =>
      (0 until b.nRows).map { i =>
        val Seq(ic, vc, tc) = b.cols
        (if (ic.valid(i)) Some(ic.longs(i)) else None,
          if (vc.valid(i)) Some(vc.doubles(i)) else None,
          if (tc.valid(i)) Some(tc.strs(i)) else None)
      }
    }

  private val FIELDS = ArrowIpcSim.FIELDS

  test("roundtrip identity: nulls, empty strings, unicode, multi-batch, empty batch") {
    val rnd = new scala.util.Random(139)
    (0 until 40).foreach { trial =>
      val nBatches = 1 + rnd.nextInt(3)
      val batches = (0 until nBatches).map { _ =>
        val n = rnd.nextInt(9) // 0-row batches are legal
        mkBatch((0 until n).map { _ =>
          (if (rnd.nextInt(5) == 0) None else Some(rnd.nextLong()),
            if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(1000) * 0.25),
            rnd.nextInt(6) match {
              case 0 => None
              case 1 => Some("")
              case 2 => Some("héllo wörld é中文 " + rnd.nextInt(100))
              case _ => Some(rnd.alphanumeric.take(rnd.nextInt(30)).mkString)
            })
        })
      }
      val bytes = encode(FIELDS, batches)
      val (fs, back) = decode(bytes).getOrElse(fail(s"trial $trial quarantined"))
      assert(fs == FIELDS)
      assert(back.size == batches.size)
      assert(flatten(back) == flatten(batches))
    }
  }

  test("clean docs replay the closed-form grid") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val text = "The quick brown fox jumps over the lazy dog é中 " * 3
      val (fs, bs) = decode(ArrowIpcSim.streamFor(docId, text)).get
      assert(fs == FIELDS)
      val k = ArrowIpcSim.k(docId)
      assert(bs.map(_.nRows).sum == k)
      assert(bs.size == (k + 3) / 4)
      val rows = flatten(bs)
      val sl = ArrowIpcSim.slices(text, k)
      rows.zipWithIndex.foreach { case ((id, v, t), j) =>
        assert(id.contains(docId * 100 + j))
        if ((docId + j) % 8 == 0) assert(v.isEmpty)
        else assert(v.contains(((docId + j) % 41) * 0.25))
        if ((docId + j) % 6 == 0) assert(t.isEmpty)
        else assert(t.contains(sl(j)))
      }
    }
  }

  test("damage classes: truncation, the lying null_count, the lying utf8 offset") {
    val text = "some document text for the damage classes, long enough to slice"
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L))
      assert(decode(ArrowIpcSim.streamFor(docId, text)).isEmpty,
        s"doc $docId should quarantine")
    // and the lies are ONLY in the metadata: the same stream without
    // the lie decodes fine
    for (docId <- Seq(3L, 5L, 10L, 12L))
      assert(decode(encode(FIELDS,
        ArrowIpcSim.batchesFor(docId, text))).isDefined)
  }

  test("every truncation quarantines (never wrong rows, never a crash)") {
    val bytes = encode(FIELDS, Seq(mkBatch(Seq(
      (Some(1L), Some(0.5), Some("abc")),
      (None, None, None),
      (Some(3L), Some(1.5), Some("déf"))))))
    (0 until bytes.length).foreach { cut =>
      assert(decode(java.util.Arrays.copyOf(bytes, cut)).isEmpty,
        s"prefix $cut must quarantine")
    }
    // trailing garbage after EOS quarantines too
    assert(decode(bytes :+ 0.toByte).isEmpty)
  }

  test("strictness: big-endian schemas, dictionaries, unknown header types rejected") {
    // a stream whose continuation marker is wrong
    val good = encode(FIELDS, Seq(mkBatch(Seq((Some(1L), Some(0.25), Some("x"))))))
    val bad = good.clone(); bad(0) = 0
    assert(decode(bad).isEmpty)
    // metadata size not 8-aligned
    val bad2 = good.clone(); bad2(4) = (bad2(4) + 1).toByte
    assert(decode(bad2).isEmpty)
  }

  // ---------------------------------------------------------- interop

  import org.apache.arrow.memory.RootAllocator
  import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector, VectorSchemaRoot}
  import org.apache.arrow.vector.types.FloatingPointPrecision
  import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
  import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
  import scala.jdk.CollectionConverters._

  private def javaSchema: Schema = new Schema(Seq(
    new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
    new Field("val", FieldType.nullable(
      new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null),
    new Field("text", FieldType.nullable(new ArrowType.Utf8()), null)).asJava)

  test("interop 1: arrow-vector's ArrowStreamReader reads our writer's streams row-identical") {
    val batches = Seq(
      mkBatch(Seq((Some(11L), Some(2.5), Some("alpha")),
        (None, Some(0.0), None),
        (Some(-3L), None, Some("β unicode")))),
      mkBatch(Seq((Some(Long.MaxValue), Some(-1.25), Some("")))))
    val bytes = encode(FIELDS, batches)
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.asScala.map(_.getName) ==
        Seq("id", "val", "text"))
      val got = Seq.newBuilder[(Option[Long], Option[Double], Option[String])]
      while (reader.loadNextBatch()) {
        val id = root.getVector("id").asInstanceOf[BigIntVector]
        val v = root.getVector("val").asInstanceOf[Float8Vector]
        val t = root.getVector("text").asInstanceOf[VarCharVector]
        (0 until root.getRowCount).foreach { i =>
          got += ((if (id.isNull(i)) None else Some(id.get(i)),
            if (v.isNull(i)) None else Some(v.get(i)),
            if (t.isNull(i)) None
            else Some(new String(t.get(i), "UTF-8"))))
        }
      }
      assert(got.result() == flatten(batches))
    } finally { reader.close(); alloc.close() }
  }

  test("interop 2: real ArrowStreamWriter bytes walk through our reader with the audits ON") {
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(javaSchema, alloc)
    val out = new java.io.ByteArrayOutputStream
    val w = new ArrowStreamWriter(root, null,
      java.nio.channels.Channels.newChannel(out))
    val expect = Seq.newBuilder[(Option[Long], Option[Double], Option[String])]
    try {
      w.start()
      val data = Seq(
        Seq((Some(1L), Some(0.5), Some("one")),
          (Some(2L), None, Some("twö")),
          (None, Some(7.25), None)),
        Seq((Some(-9L), Some(1e100), Some("")),
          (Some(0L), Some(0.0), Some("tail"))))
      data.foreach { batch =>
        root.allocateNew()
        val id = root.getVector("id").asInstanceOf[BigIntVector]
        val v = root.getVector("val").asInstanceOf[Float8Vector]
        val t = root.getVector("text").asInstanceOf[VarCharVector]
        batch.zipWithIndex.foreach { case ((oi, ov, ot), i) =>
          oi.foreach(x => id.setSafe(i, x))
          ov.foreach(x => v.setSafe(i, x))
          ot.foreach(x => t.setSafe(i, x.getBytes("UTF-8")))
          expect += ((oi, ov, ot))
        }
        root.setRowCount(batch.size)
        w.writeBatch()
      }
      w.end()
    } finally { w.close(); root.close(); alloc.close() }
    val (fs, bs) = decode(out.toByteArray)
      .getOrElse(fail("real arrow-vector stream quarantined"))
    assert(fs == FIELDS)
    assert(flatten(bs) == expect.result())
  }
}
