package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Apache Iceberg metadata tree — the OTHER table format a 100 TB
  * lake runs on (d141 covered Delta's JSON log; Iceberg keeps its
  * state in AVRO manifests) — implemented from the published spec
  * (iceberg.apache.org/spec/), stacked entirely on in-repo layers:
  * table metadata through d141's strict JSON parser, the manifest
  * LIST and manifest FILES through d121's Avro OCF container (the
  * generic-schema surface), the data files through d126's parquet
  * walker.
  *
  * Surface (a bounded flat projection of the spec's manifest schemas,
  * documented as such — the container grammar, field order and
  * resolution semantics are the spec's):
  *
  *  - TABLE METADATA JSON: format-version 2 (other versions
  *    quarantine — the spec's reader rule), table-uuid,
  *    current-snapshot-id (which must RESOLVE in the snapshot list),
  *    snapshots with snapshot-id / sequence-number / manifest-list;
  *  - the MANIFEST LIST (Avro OCF): one `manifest_file` record per
  *    manifest — path, length, partition-spec-id, added_snapshot_id
  *    (must resolve in the snapshot list), and the
  *    added/existing/deleted FILE COUNTS every planner prunes
  *    manifests with;
  *  - MANIFEST FILES (Avro OCF): `manifest_entry` records — status
  *    (1 added / 0 existing / 2 deleted; others quarantine),
  *    snapshot_id, and the nested `data_file` struct (file_path,
  *    file_format — PARQUET only, never guessed — record_count,
  *    file_size_in_bytes);
  *  - RESOLUTION: the union of all manifests' entries, deletes
  *    removing earlier adds (a delete for a never-added path, or a
  *    duplicate add of the same path, is a broken tree and
  *    quarantines);
  *  - THE AUDITS: each manifest's `manifest_length` must equal the
  *    bytes actually read (the lying-length class), its
  *    added/existing/deleted counts must equal the entries actually
  *    inside (the lying-stats class at the MANIFEST level — this is
  *    what manifest pruning trusts), and every live data file is READ
  *    BACK through the d126 parquet walker with record_count checked
  *    (the d141 discipline at the second table format).
  */
object IcebergSnap {
  import DeltaJson._

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private[graft] val MANIFEST_LIST_SCHEMA =
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"added_snapshot_id","type":"long"},
      |{"name":"added_files_count","type":"int"},
      |{"name":"existing_files_count","type":"int"},
      |{"name":"deleted_files_count","type":"int"},
      |{"name":"sequence_number","type":"long"}]}""".stripMargin

  private[graft] val MANIFEST_SCHEMA =
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":"long"},
      |{"name":"sequence_number","type":"long"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin

  final case class ManifestRef(path: String, length: Long, specId: Int,
      addedSnap: Long, added: Int, existing: Int, deleted: Int, seq: Long)
  final case class Entry(status: Int, snap: Long, seq: Long, path: String,
      format: String, recordCount: Long, size: Long)

  // -------------------------------------------------------- avro bodies

  private[graft] def encodeManifestList(refs: Seq[ManifestRef],
      sync: Array[Byte], deflate: Boolean): Array[Byte] = {
    val blocks = refs.grouped(2).map { g =>
      val w = AvroOcfCodec.writer()
      g.foreach { m =>
        w.string(m.path).long(m.length).int(m.specId).long(m.addedSnap)
          .int(m.added).int(m.existing).int(m.deleted).long(m.seq)
      }
      (g.size, w.bytes)
    }.toSeq
    AvroOcfCodec.encodeGeneric(MANIFEST_LIST_SCHEMA, blocks, sync, deflate)
  }

  private[graft] def decodeManifestList(b: Array[Byte]): Seq[ManifestRef] = {
    val blocks = AvroOcfCodec.decodeGeneric(b, MANIFEST_LIST_SCHEMA)
      .getOrElse(throw Malformed)
    blocks.flatMap { case (count, body) =>
      val r = AvroOcfCodec.reader(body)
      val out = (0L until count).map { _ =>
        ManifestRef(r.string(), r.long(), r.int(), r.long(), r.int(),
          r.int(), r.int(), r.long())
      }
      if (r.hasMore) throw Malformed // the block count lies
      out
    }
  }

  private[graft] def encodeManifest(entries: Seq[Entry], sync: Array[Byte],
      deflate: Boolean): Array[Byte] = {
    val blocks = entries.grouped(2).map { g =>
      val w = AvroOcfCodec.writer()
      g.foreach { e =>
        w.int(e.status).long(e.snap).long(e.seq)
          .string(e.path).string(e.format).long(e.recordCount).long(e.size)
      }
      (g.size, w.bytes)
    }.toSeq
    AvroOcfCodec.encodeGeneric(MANIFEST_SCHEMA, blocks, sync, deflate)
  }

  private[graft] def decodeManifest(b: Array[Byte]): Seq[Entry] = {
    val blocks = AvroOcfCodec.decodeGeneric(b, MANIFEST_SCHEMA)
      .getOrElse(throw Malformed)
    blocks.flatMap { case (count, body) =>
      val r = AvroOcfCodec.reader(body)
      val out = (0L until count).map { _ =>
        Entry(r.int(), r.long(), r.long(), r.string(), r.string(),
          r.long(), r.long())
      }
      if (r.hasMore) throw Malformed
      out
    }
  }

  // -------------------------------------------------------- resolution

  final case class Snapshot(nSnapshots: Int, nManifests: Int,
      live: Seq[Entry])

  /** metadata JSON + a file store → the resolved live set, every
    * audit applied. Throws on any violation. */
  def resolve(metadataJson: String,
      files: Map[String, Array[Byte]]): Snapshot = {
    val meta = obj(parse(metadataJson))
    if (num(meta.getOrElse("format-version", throw Malformed)) != 2)
      throw Malformed // the spec's version rule: refuse, don't guess
    str(meta.getOrElse("table-uuid", throw Malformed))
    val currentId = num(meta.getOrElse("current-snapshot-id", throw Malformed))
    val snaps = meta.getOrElse("snapshots", throw Malformed) match {
      case JArr(xs) => xs.map(obj)
      case _ => throw Malformed
    }
    val snapIds = snaps.map(s =>
      num(s.getOrElse("snapshot-id", throw Malformed))).toSet
    if (snapIds.size != snaps.size) throw Malformed // duplicate ids
    val current = snaps.find(s => num(s("snapshot-id")) == currentId)
      .getOrElse(throw Malformed) // current-snapshot-id must resolve
    val listPath = str(current.getOrElse("manifest-list", throw Malformed))
    val listBytes = files.getOrElse(listPath, throw Malformed)
    val refs = decodeManifestList(listBytes)
    val state = scala.collection.mutable.LinkedHashMap[String, Entry]()
    refs.foreach { m =>
      if (!snapIds.contains(m.addedSnap)) throw Malformed // dangling snapshot
      val mb = files.getOrElse(m.path, throw Malformed)
      // the lying-length audit: the list's length field is what a
      // planner uses to range-read the manifest
      if (mb.length.toLong != m.length) throw Malformed
      val entries = decodeManifest(mb)
      // the lying-counts audit: manifest pruning trusts these
      if (entries.count(_.status == 1) != m.added ||
        entries.count(_.status == 0) != m.existing ||
        entries.count(_.status == 2) != m.deleted) throw Malformed
      entries.foreach { e =>
        if (e.status != 0 && e.status != 1 && e.status != 2) throw Malformed
        if (e.format != "PARQUET") throw Malformed // never guessed
        if (!snapIds.contains(e.snap)) throw Malformed
        e.status match {
          case 2 =>
            if (!state.contains(e.path)) throw Malformed // dangling delete
            state.remove(e.path)
          case _ =>
            if (state.contains(e.path)) throw Malformed // duplicate add
            state(e.path) = e
        }
      }
    }
    Snapshot(snaps.size, refs.size, state.values.toSeq)
  }
}

/** In-plan synthesizer + gate for d146: each doc an Iceberg table of
  * two snapshots — s1 adds f0/f1 via manifest m1; s2 (current) keeps
  * m1 and adds m2, which DELETES f1 and adds f2 (+f3 on odd docs) —
  * data files written by the d126 parquet writer (codec rotated),
  * manifests as Avro OCF (deflate on doc_id%3==1), resolved with
  * every audit ON and every live file read back. Damage %7: 0 →
  * manifest-list truncation; 3 → a LYING record_count in f2's
  * data_file (the parquet intact — only the read-back audit catches
  * it); 5 → a LYING added_files_count on m2 (the manifest intact —
  * only the counts audit catches the field pruning trusts). */
object IcebergSim {
  import IcebergSnap._

  private[graft] def nRows(docId: Long, j: Int): Int =
    (2 + (docId + j) % 3).toInt

  private[graft] def fileRows(docId: Long, j: Int): Seq[(Long, Long, String)] =
    (0 until nRows(docId, j)).map { i =>
      (docId * 1000 + j * 10 + i, (docId * 3 + j + i) % 89, s"i${docId}f${j}r$i")
    }

  private[graft] def nFiles(docId: Long): Int = if (docId % 2 == 1) 4 else 3

  private[graft] def syncFor(docId: Long, which: Int): Array[Byte] = {
    val s = new Array[Byte](16)
    var i = 0
    while (i < 16) { s(i) = ((docId * 31 + which * 7 + i) & 0xff).toByte; i += 1 }
    s
  }

  /** (metadata json, file store), damage applied. */
  private[graft] def tableFor(docId: Long)
      : (String, Map[String, Array[Byte]]) = {
    val mode = docId % 7
    val s1 = docId * 100 + 1
    val s2 = docId * 100 + 2
    val deflate = docId % 3 == 1
    val parquets = (0 until nFiles(docId)).map { j =>
      s"f$j.parquet" -> ParquetFile.write(fileRows(docId, j), rowGroupCut = 4,
        codec = Seq(0, 1, 2, 6)((docId % 4).toInt))
    }.toMap
    def entry(status: Int, snap: Long, seq: Long, j: Int,
        lieCount: Boolean): Entry =
      Entry(status, snap, seq, s"f$j.parquet", "PARQUET",
        nRows(docId, j) + (if (lieCount) 1 else 0),
        parquets(s"f$j.parquet").length.toLong)
    val m1 = encodeManifest(Seq(
      entry(1, s1, 1, 0, lieCount = false),
      entry(1, s1, 1, 1, lieCount = false)), syncFor(docId, 1), deflate)
    val m2Entries = Seq(
      Entry(2, s2, 2, "f1.parquet", "PARQUET", nRows(docId, 1).toLong,
        parquets("f1.parquet").length.toLong),
      entry(1, s2, 2, 2, lieCount = mode == 3)) ++
      (if (docId % 2 == 1) Seq(entry(1, s2, 2, 3, lieCount = false)) else Nil)
    val m2 = encodeManifest(m2Entries, syncFor(docId, 2), deflate)
    val m2Added = m2Entries.count(_.status == 1) + (if (mode == 5) 1 else 0)
    val listClean = encodeManifestList(Seq(
      ManifestRef("m1.avro", m1.length.toLong, 0, s1, 2, 0, 0, 1),
      ManifestRef("m2.avro", m2.length.toLong, 0, s2,
        m2Added, 0, 1, 2)), syncFor(docId, 3), deflate)
    val list =
      if (mode == 0) java.util.Arrays.copyOf(listClean, listClean.length - 7)
      else listClean
    val meta =
      s"""{"format-version":2,"table-uuid":"tbl-$docId",""" +
        s""""current-snapshot-id":$s2,"snapshots":[""" +
        s"""{"snapshot-id":$s1,"sequence-number":1,"manifest-list":"snap-1.avro"},""" +
        s"""{"snapshot-id":$s2,"sequence-number":2,"manifest-list":"snap-2.avro"}]}"""
    val files = parquets ++ Map("m1.avro" -> m1, "m2.avro" -> m2,
      "snap-2.avro" -> list)
    (meta, files)
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_snapshots", LongType),
    StructField("n_manifests", LongType),
    StructField("n_live", LongType),
    StructField("total_rows", LongType),
    StructField("sum_ids", LongType),
    StructField("sum_vals", LongType)))

  def rows(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(rowSchema)
    docs.select(col("doc_id"))
      .mapPartitions { it =>
        it.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val out =
              try {
                val (meta, files) = tableFor(id)
                val snap = IcebergSnap.resolve(meta, files)
                var totalRows = 0L
                var sumIds = 0L
                var sumVals = 0L
                snap.live.foreach { e =>
                  val info = ParquetFile.read(files(e.path))
                    .getOrElse(throw IcebergSnap.Malformed)
                  if (info.numRows != e.recordCount)
                    throw IcebergSnap.Malformed // the read-back audit
                  totalRows += info.numRows
                  sumIds += info.cols.find(_.path == "doc_id")
                    .getOrElse(throw IcebergSnap.Malformed).sumInt
                  sumVals += info.cols.find(_.path == "val")
                    .getOrElse(throw IcebergSnap.Malformed).sumInt
                }
                Some(Row(id, snap.nSnapshots.toLong, snap.nManifests.toLong,
                  snap.live.size.toLong, totalRows, sumIds, sumVals))
              } catch { case _: Throwable => None }
            out.iterator
          }
        }
      }(enc)
  }
}
