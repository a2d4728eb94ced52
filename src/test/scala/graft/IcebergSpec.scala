package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._
import graft.operators.IcebergSnap._

/** d146: the Iceberg metadata tree — resolution semantics, the three
  * audits, the damage classes, and avro-library interop on the
  * generic-schema container surface. */
class IcebergSpec extends AnyFunSuite {

  test("clean docs resolve to the closed-form live set") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val (meta, files) = IcebergSim.tableFor(docId)
      val snap = resolve(meta, files)
      assert(snap.nSnapshots == 2 && snap.nManifests == 2)
      val expect =
        if (docId % 2 == 1) Set("f0.parquet", "f2.parquet", "f3.parquet")
        else Set("f0.parquet", "f2.parquet")
      assert(snap.live.map(_.path).toSet == expect)
      snap.live.foreach { e =>
        val info = ParquetFile.read(files(e.path)).get
        assert(info.numRows == e.recordCount)
      }
    }
  }

  test("damage classes: list truncation, the lying record_count, the lying added count") {
    for (docId <- Seq(0L, 7L, 14L, 5L, 12L, 19L)) {
      val (meta, files) = IcebergSim.tableFor(docId)
      assertThrows[Throwable](resolve(meta, files))
    }
    // the lying record_count resolves fine — only the read-back
    // audit catches it (the lie lives in the manifest, the file is
    // intact)
    for (docId <- Seq(3L, 10L, 17L)) {
      val (meta, files) = IcebergSim.tableFor(docId)
      val snap = resolve(meta, files)
      val f2 = snap.live.find(_.path == "f2.parquet").get
      assert(ParquetFile.read(files("f2.parquet")).get.numRows != f2.recordCount)
    }
  }

  test("tree rules: versions, dangling references, duplicate adds refuse") {
    val (meta, files) = IcebergSim.tableFor(2L)
    // format-version 3: refuse, don't guess
    assertThrows[Throwable](resolve(meta.replace(
      "\"format-version\":2", "\"format-version\":3"), files))
    // current snapshot that doesn't resolve
    assertThrows[Throwable](resolve(meta.replace(
      "\"current-snapshot-id\":202", "\"current-snapshot-id\":999"), files))
    // a delete for a never-added path
    val e = Entry(2, 201, 1, "ghost.parquet", "PARQUET", 1, 1)
    val badManifest = encodeManifest(Seq(e), IcebergSim.syncFor(2L, 9),
      deflate = false)
    val files2 = files + ("m1.avro" -> badManifest)
    assertThrows[Throwable](resolve(meta, files2)) // (length audit or the dangling delete)
    // duplicate add of one path inside a manifest
    val dup = Entry(1, 201, 1, "f0.parquet", "PARQUET", 2, 10)
    val dupManifest = encodeManifest(Seq(dup, dup), IcebergSim.syncFor(2L, 8),
      deflate = false)
    assertThrows[Throwable](decodeManifest(dupManifest).foldLeft(
      Set.empty[String]) { (seen, x) =>
      if (seen(x.path)) throw new RuntimeException("dup")
      seen + x.path
    })
  }

  test("generic container: the wrong schema and lying block counts quarantine") {
    val refs = Seq(ManifestRef("m.avro", 10, 0, 1, 1, 0, 0, 1))
    val bytes = encodeManifestList(refs, IcebergSim.syncFor(1L, 1),
      deflate = false)
    assert(decodeManifestList(bytes).head == refs.head)
    // reading it under the MANIFEST schema must refuse
    assertThrows[Throwable](decodeManifest(bytes))
    // OCF has no global trailer (the d121 honesty note): a truncation
    // either quarantines or drops whole trailing blocks — it can never
    // yield a record that wasn't written
    (1 until bytes.length).foreach { cut =>
      val t = java.util.Arrays.copyOf(bytes, cut)
      val got = try Some(decodeManifestList(t)) catch {
        case _: Throwable => None
      }
      got.foreach { rs =>
        assert(rs.size < refs.size, s"cut $cut kept every record")
        assert(rs.zip(refs).forall { case (a, b) => a == b })
      }
    }
  }

  // ---- avro-library interop on the generic surface -------------------

  import org.apache.avro.Schema
  import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
  import org.apache.avro.file.{DataFileStream, DataFileWriter}
  import org.apache.avro.io.DatumWriter

  test("interop 1: real avro reads our manifest lists record-identical") {
    val (_, files) = IcebergSim.tableFor(6L)
    val ours = files("snap-2.avro")
    val schema = new Schema.Parser().parse(MANIFEST_LIST_SCHEMA)
    val reader = new DataFileStream[GenericRecord](
      new java.io.ByteArrayInputStream(ours),
      new GenericDatumReader[GenericRecord](schema))
    try {
      val got = Seq.newBuilder[(String, Long, Int)]
      while (reader.hasNext) {
        val r = reader.next()
        got += ((r.get("manifest_path").toString,
          r.get("manifest_length").asInstanceOf[Long],
          r.get("added_files_count").asInstanceOf[Int]))
      }
      val want = decodeManifestList(ours).map(m => (m.path, m.length, m.added))
      assert(got.result() == want)
    } finally reader.close()
  }

  test("interop 2: a DataFileWriter-written manifest list walks through our decoder") {
    val schema = new Schema.Parser().parse(MANIFEST_LIST_SCHEMA)
    val out = new java.io.ByteArrayOutputStream
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema): DatumWriter[GenericRecord])
    w.create(schema, out)
    val refs = Seq(
      ManifestRef("a/m1.avro", 123L, 0, 11L, 2, 0, 0, 1L),
      ManifestRef("a/m2.avro", 456L, 0, 12L, 1, 0, 1, 2L))
    refs.foreach { m =>
      val r = new GenericData.Record(schema)
      r.put("manifest_path", m.path)
      r.put("manifest_length", m.length)
      r.put("partition_spec_id", m.specId)
      r.put("added_snapshot_id", m.addedSnap)
      r.put("added_files_count", m.added)
      r.put("existing_files_count", m.existing)
      r.put("deleted_files_count", m.deleted)
      r.put("sequence_number", m.seq)
      w.append(r)
    }
    w.close()
    assert(decodeManifestList(out.toByteArray) == refs)
  }
}
