package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Delta Lake transaction log — the TABLE-FORMAT layer a 100 TB
  * parquet warehouse actually runs on (the `_delta_log/` directory of
  * versioned JSON commits every reader replays before touching a data
  * file) — implemented from the published protocol
  * (github.com/delta-io/delta PROTOCOL.md), on top of OUR OWN d126
  * parquet walker:
  *
  *  - a strict from-scratch RFC 8259 JSON parser (objects with
  *    duplicate-key rejection, arrays, strings with the full escape
  *    table incl. \uXXXX, numbers, literals; exactly one value per
  *    line, no trailing garbage) — Delta nests stats as a JSON string
  *    INSIDE JSON, so the escape path is load-bearing;
  *  - log replay: versions must be CONTIGUOUS from 0 (a gap means an
  *    unreadable table — quarantine), version 0 must carry `protocol`
  *    and `metaData`, `protocol.minReaderVersion` above what we
  *    implement QUARANTINES (the protocol's own must-refuse rule),
  *    `metaData.format.provider` must be parquet, unknown action
  *    types quarantine (never guessed);
  *  - add/remove reconciliation by path, LATEST ACTION WINS (a re-add
  *    replaces the earlier entry); a `remove` whose path was never
  *    added is a log written out of order — with replay starting at
  *    version 0 every legitimate tombstone has its add in scope — and
  *    QUARANTINES;
  *  - THE STATS AUDIT (the d126/d133/d138 lying-metadata discipline
  *    at the table layer): every surviving add's `stats` JSON
  *    (numRecords, minValues/maxValues on `val`) is recomputed by
  *    READING THE DATA FILE through our own parquet walker — the
  *    numbers a planner prunes files with are exactly the numbers
  *    worth lying about.
  */
object DeltaJson {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  sealed trait JVal
  final case class JObj(fields: Map[String, JVal]) extends JVal
  final case class JArr(items: Seq[JVal]) extends JVal
  final case class JStr(v: String) extends JVal
  final case class JNum(v: Long) extends JVal
  final case class JDbl(v: Double) extends JVal
  final case class JBool(v: Boolean) extends JVal
  case object JNull extends JVal

  /** Strict parse of exactly one JSON value (plus whitespace). */
  def parse(s: String): JVal = {
    var i = 0
    def ws(): Unit =
      while (i < s.length && (s(i) == ' ' || s(i) == '\t' || s(i) == '\n' ||
        s(i) == '\r')) i += 1
    def expect(c: Char): Unit = {
      if (i >= s.length || s(i) != c) throw Malformed
      i += 1
    }
    def hex(): Int = {
      if (i >= s.length) throw Malformed
      val c = s(i); i += 1
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else throw Malformed
    }
    def string(): String = {
      expect('"')
      val sb = new StringBuilder
      var done = false
      while (!done) {
        if (i >= s.length) throw Malformed
        val c = s(i); i += 1
        if (c == '"') done = true
        else if (c == '\\') {
          if (i >= s.length) throw Malformed
          val e = s(i); i += 1
          e match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              sb += (((hex() << 12) | (hex() << 8) | (hex() << 4) | hex())
                .toChar)
            case _ => throw Malformed
          }
        } else if (c < ' ') throw Malformed // raw control chars illegal
        else sb += c
      }
      sb.toString
    }
    def number(): JVal = {
      val start = i
      if (i < s.length && s(i) == '-') i += 1
      if (i >= s.length) throw Malformed
      if (s(i) == '0') i += 1
      else if (s(i) >= '1' && s(i) <= '9') {
        while (i < s.length && s(i).isDigit) i += 1
      } else throw Malformed
      var integral = true
      if (i < s.length && s(i) == '.') {
        integral = false
        i += 1
        if (i >= s.length || !s(i).isDigit) throw Malformed
        while (i < s.length && s(i).isDigit) i += 1
      }
      if (i < s.length && (s(i) == 'e' || s(i) == 'E')) {
        integral = false
        i += 1
        if (i < s.length && (s(i) == '+' || s(i) == '-')) i += 1
        if (i >= s.length || !s(i).isDigit) throw Malformed
        while (i < s.length && s(i).isDigit) i += 1
      }
      val txt = s.substring(start, i)
      if (integral) JNum(java.lang.Long.parseLong(txt)) else JDbl(txt.toDouble)
    }
    def value(): JVal = {
      ws()
      if (i >= s.length) throw Malformed
      s(i) match {
        case '{' =>
          i += 1
          ws()
          val m = scala.collection.mutable.LinkedHashMap[String, JVal]()
          if (i < s.length && s(i) == '}') { i += 1 }
          else {
            var more = true
            while (more) {
              ws()
              val k = string()
              if (m.contains(k)) throw Malformed // duplicate keys
              ws(); expect(':')
              m(k) = value()
              ws()
              if (i < s.length && s(i) == ',') i += 1
              else { expect('}'); more = false }
            }
          }
          JObj(m.toMap)
        case '[' =>
          i += 1
          ws()
          val b = Seq.newBuilder[JVal]
          if (i < s.length && s(i) == ']') { i += 1 }
          else {
            var more = true
            while (more) {
              b += value()
              ws()
              if (i < s.length && s(i) == ',') i += 1
              else { expect(']'); more = false }
            }
          }
          JArr(b.result())
        case '"' => JStr(string())
        case 't' => expect('t'); expect('r'); expect('u'); expect('e'); JBool(true)
        case 'f' =>
          expect('f'); expect('a'); expect('l'); expect('s'); expect('e')
          JBool(false)
        case 'n' => expect('n'); expect('u'); expect('l'); expect('l'); JNull
        case _ => number()
      }
    }
    val v = value()
    ws()
    if (i != s.length) throw Malformed // trailing garbage
    v
  }

  private[operators] def obj(v: JVal): Map[String, JVal] = v match {
    case JObj(m) => m
    case _ => throw Malformed
  }
  private[operators] def str(v: JVal): String = v match {
    case JStr(x) => x
    case _ => throw Malformed
  }
  private[operators] def num(v: JVal): Long = v match {
    case JNum(x) => x
    case _ => throw Malformed
  }
}

/** Replay + audit of one table's `_delta_log`. */
object DeltaLog {
  import DeltaJson._

  final case class AddEntry(path: String, numRecords: Long, minVal: Long,
      maxVal: Long)
  final case class Snapshot(nVersions: Int, live: Seq[AddEntry])

  private val KNOWN = Set("protocol", "metaData", "add", "remove",
    "commitInfo")

  /** Strict replay of commit files (version → line-delimited JSON).
    * Throws on any protocol violation. */
  def replay(versions: Seq[(Long, String)]): Snapshot = {
    val sorted = versions.sortBy(_._1)
    if (sorted.isEmpty) throw Malformed
    sorted.zipWithIndex.foreach { case ((v, _), idx) =>
      if (v != idx) throw Malformed // contiguous from 0 — a gap is unreadable
    }
    var sawProtocol = false
    var sawMeta = false
    val state = scala.collection.mutable.LinkedHashMap[String, AddEntry]()
    sorted.foreach { case (version, content) =>
      content.split("\n").filter(_.nonEmpty).foreach { line =>
        val action = obj(parse(line))
        if (action.size != 1) throw Malformed // one action per line
        val (kind, body) = action.head
        if (!KNOWN(kind)) throw Malformed // unknown actions: never guessed
        kind match {
          case "protocol" =>
            val p = obj(body)
            if (num(p.getOrElse("minReaderVersion", throw Malformed)) > 1)
              throw Malformed // the protocol's must-refuse rule
            sawProtocol = true
          case "metaData" =>
            val m = obj(body)
            str(m.getOrElse("id", throw Malformed))
            val fmt = obj(m.getOrElse("format", throw Malformed))
            if (str(fmt.getOrElse("provider", throw Malformed)) != "parquet")
              throw Malformed
            sawMeta = true
          case "add" =>
            val a = obj(body)
            val path = str(a.getOrElse("path", throw Malformed))
            if (num(a.getOrElse("size", throw Malformed)) < 0) throw Malformed
            // stats ride as a JSON string INSIDE the JSON action
            val stats = obj(parse(str(a.getOrElse("stats", throw Malformed))))
            val nRec = num(stats.getOrElse("numRecords", throw Malformed))
            val mins = obj(stats.getOrElse("minValues", throw Malformed))
            val maxs = obj(stats.getOrElse("maxValues", throw Malformed))
            state(path) = AddEntry(path, nRec,
              num(mins.getOrElse("val", throw Malformed)),
              num(maxs.getOrElse("val", throw Malformed)))
          case "remove" =>
            val r = obj(body)
            val path = str(r.getOrElse("path", throw Malformed))
            // replay starts at version 0, so every legitimate tombstone
            // has its add in scope: a dangling remove is a broken log
            if (!state.contains(path)) throw Malformed
            state.remove(path)
          case "commitInfo" => obj(body) // parsed, ignored (spec)
        }
      }
      if (version == 0 && (!sawProtocol || !sawMeta)) throw Malformed
    }
    Snapshot(sorted.size, state.values.toSeq)
  }
}

/** In-plan synthesizer + gate for d141: each doc is a mini Delta table
  * — data files written by OUR d126 parquet writer (codec rotated by
  * doc_id%4), a log of 2 + doc_id%2 commits (protocol/metaData/adds at
  * v0; an add + a remove at v1; on odd docs a v2 that adds f3 and
  * RE-ADDS f0, exercising latest-add-wins), commitInfo noise in every
  * commit — replayed strictly, then every live file READ BACK through
  * our parquet walker with the stats audit ON. Damage %7: 0 → the
  * second commit is numbered 2 (a version GAP — the contiguity rule
  * catches the hole); 3 → a LYING numRecords in f2's stats (the file
  * intact — only the read-back audit catches it); 5 → a remove for a
  * path never added (the reconciliation rule). Damaged docs contribute
  * nothing (the d111 rule). */
object DeltaLogSim {

  private[graft] def nRows(docId: Long, j: Int): Int =
    (2 + (docId + j) % 3).toInt

  private[graft] def fileRows(docId: Long, j: Int): Seq[(Long, Long, String)] =
    (0 until nRows(docId, j)).map { i =>
      (docId * 1000 + j * 10 + i, (docId + j + i) % 97, s"d${docId}f${j}r$i")
    }

  private[graft] def addJson(docId: Long, j: Int, lieNumRecords: Boolean,
      size: Int): String = {
    val rows = fileRows(docId, j)
    val nRec = rows.size + (if (lieNumRecords) 1 else 0)
    val vals = rows.map(_._2)
    val stats = s"""{\\"numRecords\\":$nRec,\\"minValues\\":{\\"val\\":${vals.min}},""" +
      s"""\\"maxValues\\":{\\"val\\":${vals.max}}}"""
    s"""{"add":{"path":"f$j.parquet","partitionValues":{},"size":$size,""" +
      s""""modificationTime":1700000${j}00000,"dataChange":true,""" +
      s""""stats":"$stats"}}"""
  }

  /** (log commits, file store), damage applied. */
  private[graft] def tableFor(docId: Long)
      : (Seq[(Long, String)], Map[String, Array[Byte]]) = {
    val mode = docId % 7
    val nFiles = if (docId % 2 == 1) 4 else 3
    val files = (0 until nFiles).map { j =>
      s"f$j.parquet" -> ParquetFile.write(fileRows(docId, j), rowGroupCut = 4,
        codec = Seq(0, 1, 2, 6)((docId % 4).toInt))
    }.toMap
    def add(j: Int): String =
      addJson(docId, j, lieNumRecords = mode == 3 && j == 2,
        size = files(s"f$j.parquet").length)
    def remove(path: String): String =
      s"""{"remove":{"path":"$path","deletionTimestamp":1700000100001,""" +
        s""""dataChange":true}}"""
    def info(op: String): String =
      s"""{"commitInfo":{"timestamp":1700000000000,"operation":"$op"}}"""
    val v0 = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"tbl-$docId","format":{"provider":"parquet",""" +
        s""""options":{}},"schemaString":"{\\"type\\":\\"struct\\"}",""" +
        s""""partitionColumns":[]}}""",
      info("CREATE"), add(0), add(1)).mkString("\n")
    val v1 = (Seq(info("WRITE"), add(2), remove("f1.parquet")) ++
      (if (mode == 5) Seq(remove("phantom.parquet")) else Nil)).mkString("\n")
    val commits = Seq(0L -> v0, (if (mode == 0) 2L else 1L) -> v1) ++
      (if (docId % 2 == 1)
        Seq((if (mode == 0) 3L else 2L) ->
          Seq(info("WRITE"), add(3), add(0)).mkString("\n"))
      else Nil)
    (commits, files)
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_versions", LongType),
    StructField("n_live", LongType),
    StructField("total_rows", LongType),
    StructField("sum_ids", LongType),
    StructField("sum_vals", LongType),
    StructField("text_bytes", LongType)))

  /** The gate: replay the log, read every live file back through the
    * d126 walker, audit its stats, aggregate. */
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
                val (commits, files) = tableFor(id)
                val snap = DeltaLog.replay(commits)
                var totalRows = 0L
                var sumIds = 0L
                var sumVals = 0L
                var textBytes = 0L
                snap.live.foreach { a =>
                  val bytes = files.getOrElse(a.path, throw DeltaJson.Malformed)
                  val info = ParquetFile.read(bytes)
                    .getOrElse(throw DeltaJson.Malformed)
                  // THE AUDIT: the planner's pruning stats must match
                  // the file actually read
                  val valCol = info.cols.find(_.path == "val")
                    .getOrElse(throw DeltaJson.Malformed)
                  if (info.numRows != a.numRecords ||
                    valCol.minInt != a.minVal || valCol.maxInt != a.maxVal)
                    throw DeltaJson.Malformed
                  totalRows += info.numRows
                  sumIds += info.cols.find(_.path == "doc_id")
                    .getOrElse(throw DeltaJson.Malformed).sumInt
                  sumVals += valCol.sumInt
                  textBytes += info.cols.find(_.path == "text")
                    .getOrElse(throw DeltaJson.Malformed).byteLen
                }
                Some(Row(id, snap.nVersions.toLong, snap.live.size.toLong,
                  totalRows, sumIds, sumVals, textBytes))
              } catch { case _: Throwable => None }
            out.iterator
          }
        }
      }(enc)
  }
}

/** d173 — CHECKPOINT replay: real readers never replay a long JSON
  * log from 0; `_last_checkpoint` names a `NN.checkpoint.parquet`
  * whose ROWS are the reconciled table state, and the JSON commits
  * AFTER it replay on top. The checkpoint is exactly the file worth
  * auditing for lying state — it compresses away the history a reader
  * would otherwise cross-check — so the d141 discipline extends to
  * it: the checkpoint parquet walks through OUR d126 reader (full
  * audit) and its VALUES come back through [[ParquetFile.readRows]];
  * `_last_checkpoint.size` must equal the action count actually
  * inside; action indices must be contiguous (state order is part of
  * the contract); the type-code column must agree with the action
  * JSON (a mislabeled row is a lie); a path both ADDED and
  * TOMBSTONED in one checkpoint state quarantines; post-checkpoint
  * commits must be version-contiguous from checkpoint+1 and their
  * removes must hit checkpoint-or-later state; and every live file's
  * pruning stats are still recomputed from the data bytes. */
object DeltaCheckpoint {
  import DeltaJson._
  import DeltaLog.{AddEntry, Snapshot}

  /** (checkpoint version, snapshot over checkpoint + commits). */
  def replay(lastCheckpoint: String, ckptRows: Seq[(Long, Long, String)],
             commits: Seq[(Long, String)]): (Long, Snapshot) = {
    val lc = obj(parse(lastCheckpoint))
    val ckVer = num(lc.getOrElse("version", throw Malformed))
    val ckSize = num(lc.getOrElse("size", throw Malformed))
    if (ckVer < 0) throw Malformed
    // THE SIZE AUDIT: the sidecar's action count vs the file's rows
    if (ckSize != ckptRows.length.toLong) throw Malformed
    var sawProtocol = false
    var sawMeta = false
    val state = scala.collection.mutable.LinkedHashMap[String, AddEntry]()
    val tombstones = scala.collection.mutable.LinkedHashSet[String]()
    def parseAdd(body: JVal): AddEntry = {
      val a = obj(body)
      val path = str(a.getOrElse("path", throw Malformed))
      if (num(a.getOrElse("size", throw Malformed)) < 0) throw Malformed
      val stats = obj(parse(str(a.getOrElse("stats", throw Malformed))))
      val mins = obj(stats.getOrElse("minValues", throw Malformed))
      val maxs = obj(stats.getOrElse("maxValues", throw Malformed))
      AddEntry(path, num(stats.getOrElse("numRecords", throw Malformed)),
        num(mins.getOrElse("val", throw Malformed)),
        num(maxs.getOrElse("val", throw Malformed)))
    }
    ckptRows.zipWithIndex.foreach { case ((idx, code, json), i) =>
      if (idx != i.toLong) throw Malformed // contiguous state order
      val action = obj(parse(json))
      if (action.size != 1) throw Malformed
      val (kind, body) = action.head
      val wantCode = kind match {
        case "protocol" => 0L
        case "metaData" => 1L
        case "add" => 2L
        case "remove" => 3L
        case _ => throw Malformed
      }
      if (code != wantCode) throw Malformed // a mislabeled row is a lie
      kind match {
        case "protocol" =>
          if (sawProtocol) throw Malformed
          val p = obj(body)
          if (num(p.getOrElse("minReaderVersion", throw Malformed)) > 1)
            throw Malformed
          sawProtocol = true
        case "metaData" =>
          if (sawMeta) throw Malformed
          val m = obj(body)
          str(m.getOrElse("id", throw Malformed))
          val fmt = obj(m.getOrElse("format", throw Malformed))
          if (str(fmt.getOrElse("provider", throw Malformed)) != "parquet")
            throw Malformed
          sawMeta = true
        case "add" =>
          val e = parseAdd(body)
          if (state.contains(e.path)) throw Malformed // dup add = lying state
          state(e.path) = e
        case "remove" =>
          val r = obj(body)
          tombstones += str(r.getOrElse("path", throw Malformed))
        case _ => throw Malformed
      }
    }
    if (!sawProtocol || !sawMeta) throw Malformed
    // a path both live and tombstoned in ONE state is a contradiction
    if (tombstones.exists(state.contains)) throw Malformed
    // commits AFTER the checkpoint: contiguous from ckVer + 1
    val sorted = commits.sortBy(_._1)
    sorted.zipWithIndex.foreach { case ((v, _), i) =>
      if (v != ckVer + 1 + i) throw Malformed
    }
    val KNOWN = Set("protocol", "metaData", "add", "remove", "commitInfo")
    sorted.foreach { case (_, content) =>
      content.split("\n").filter(_.nonEmpty).foreach { line =>
        val action = obj(parse(line))
        if (action.size != 1) throw Malformed
        val (kind, body) = action.head
        if (!KNOWN(kind)) throw Malformed
        kind match {
          case "add" =>
            val e = parseAdd(body) // latest wins over checkpoint state
            state(e.path) = e
          case "remove" =>
            val r = obj(body)
            val path = str(r.getOrElse("path", throw Malformed))
            if (!state.contains(path)) throw Malformed
            state.remove(path)
          case "protocol" =>
            val p = obj(body)
            if (num(p.getOrElse("minReaderVersion", throw Malformed)) > 1)
              throw Malformed
          case "metaData" =>
            val m = obj(body)
            val fmt = obj(m.getOrElse("format", throw Malformed))
            if (str(fmt.getOrElse("provider", throw Malformed)) != "parquet")
              throw Malformed
          case "commitInfo" => obj(body)
        }
      }
    }
    (ckVer, Snapshot(1 + sorted.size, state.values.toSeq))
  }
}

/** In-plan synthesizer + gate for d173: each doc is a CHECKPOINTED
  * Delta table — `_last_checkpoint` → `2.checkpoint.parquet` (written
  * by OUR parquet writer; rows = (action idx, type code, action JSON))
  * carrying state {protocol, metaData, add f0/f2/f3, tombstone f1},
  * then JSON commit v3 (add f4, remove f3) and, on odd docs, v4
  * (re-add f0 — latest-wins OVER checkpoint state). Live set: f0, f2,
  * f4. Every live file read back through the d126 walker with the
  * stats audit ON (the d141 discipline).
  *
  * Damage %7: 0 → `_last_checkpoint` declares size 7 (the sidecar
  * lie — the checkpoint itself is intact); 3 → a LYING numRecords in
  * the CHECKPOINT's add f2 (only the read-back audit catches it);
  * 5 → commit v3 removes a path absent from checkpoint state. */
object DeltaCkptSim {
  import DeltaLogSim.{fileRows, addJson}

  private[graft] def tableFor(docId: Long): (String,
      Array[Byte], Seq[(Long, String)], Map[String, Array[Byte]]) = {
    val mode = docId % 7
    val files = (0 until 5).map { j =>
      s"f$j.parquet" -> ParquetFile.write(fileRows(docId, j), rowGroupCut = 4,
        codec = Seq(0, 1, 2, 6)((docId % 4).toInt))
    }.toMap
    def add(j: Int): String =
      addJson(docId, j, lieNumRecords = mode == 3 && j == 2,
        size = files(s"f$j.parquet").length)
    def remove(path: String): String =
      s"""{"remove":{"path":"$path","deletionTimestamp":1700000100001,""" +
        s""""dataChange":true}}"""
    def info(op: String): String =
      s"""{"commitInfo":{"timestamp":1700000000000,"operation":"$op"}}"""
    val actions: Seq[(Long, String)] = Seq(
      0L -> """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      1L -> (s"""{"metaData":{"id":"tbl-$docId","format":{"provider":""" +
        s""""parquet","options":{}},"schemaString":""" +
        s""""{\\"type\\":\\"struct\\"}","partitionColumns":[]}}"""),
      2L -> add(0), 2L -> add(2), 2L -> add(3),
      3L -> remove("f1.parquet"))
    val ckptRows = actions.zipWithIndex.map { case ((code, json), i) =>
      (i.toLong, code, json)
    }
    val ckpt = ParquetFile.write(ckptRows, rowGroupCut = 3,
      codec = Seq(0, 1, 2, 6)(((docId + 1) % 4).toInt))
    val declSize = if (mode == 0) 7 else actions.length
    val lastCkpt = s"""{"version":2,"size":$declSize}"""
    val v3 = (Seq(info("WRITE"), add(4), remove("f3.parquet")) ++
      (if (mode == 5) Seq(remove("phantom.parquet")) else Nil)).mkString("\n")
    val commits = Seq(3L -> v3) ++
      (if (docId % 2 == 1) Seq(4L -> Seq(info("WRITE"), add(0)).mkString("\n"))
      else Nil)
    (lastCkpt, ckpt, commits, files)
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ckpt_version", LongType),
    StructField("n_versions", LongType),
    StructField("n_live", LongType),
    StructField("total_rows", LongType),
    StructField("sum_ids", LongType),
    StructField("sum_vals", LongType),
    StructField("text_bytes", LongType)))

  /** The gate: checkpoint replay + commit replay + file read-back. */
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
                val (lastCkpt, ckptBytes, commits, files) = tableFor(id)
                // the checkpoint parquet itself walks with the FULL
                // d126 audit before its values are trusted
                val ckptRows = ParquetFile.readRows(ckptBytes)
                  .getOrElse(throw DeltaJson.Malformed)
                val (ckVer, snap) =
                  DeltaCheckpoint.replay(lastCkpt, ckptRows, commits)
                var totalRows = 0L
                var sumIds = 0L
                var sumVals = 0L
                var textBytes = 0L
                snap.live.foreach { a =>
                  val bytes = files.getOrElse(a.path, throw DeltaJson.Malformed)
                  val info = ParquetFile.read(bytes)
                    .getOrElse(throw DeltaJson.Malformed)
                  val valCol = info.cols.find(_.path == "val")
                    .getOrElse(throw DeltaJson.Malformed)
                  if (info.numRows != a.numRecords ||
                    valCol.minInt != a.minVal || valCol.maxInt != a.maxVal)
                    throw DeltaJson.Malformed
                  totalRows += info.numRows
                  sumIds += info.cols.find(_.path == "doc_id")
                    .getOrElse(throw DeltaJson.Malformed).sumInt
                  sumVals += valCol.sumInt
                  textBytes += info.cols.find(_.path == "text")
                    .getOrElse(throw DeltaJson.Malformed).byteLen
                }
                Some(Row(id, ckVer, snap.nVersions.toLong,
                  snap.live.size.toLong, totalRows, sumIds, sumVals,
                  textBytes))
              } catch { case _: Throwable => None }
            out.iterator
          }
        }
      }(enc)
  }
}
