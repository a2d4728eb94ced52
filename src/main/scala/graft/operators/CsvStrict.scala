package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RFC 4180 CSV — the lingua franca labeled data actually arrives in
  * — as a STRICT row source, BOTH directions. Lenient CSV readers are
  * where silent corpus corruption lives (a shifted column relabels a
  * million rows without an error), so the grammar is enforced, not
  * guessed at:
  *
  *  - fields unquoted (no `,` `"` CR LF inside — a BARE QUOTE mid
  *    unquoted field is RFC-invalid and QUARANTINES where lenient
  *    parsers guess) or quoted (`""` escapes; a closing quote must be
  *    followed by a separator or end-of-record; an unterminated quote
  *    quarantines);
  *  - records separated by CRLF or LF (both accepted per line — the
  *    unix reality), embedded CR/LF legal INSIDE quotes;
  *  - EVERY record must carry the same arity (a ragged row is the
  *    column shift that silently relabels data — it quarantines);
  *    an optional trailing newline after the last record is accepted.
  *
  * Interop pinned BOTH directions against Spark's own CSV stack (the
  * univocity parser under spark.read.csv): our shards read back
  * row-identical under multiLine mode, and spark.write.csv output —
  * univocity's own quoting decisions — walks through this decoder
  * field-identical (CsvStrictSpec).
  */
object CsvCodec {

  private[operators] object Malformed extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  /** Strict parse → rows of fields; None quarantines. */
  def decode(bytes: Array[Byte]): Option[Seq[Seq[String]]] =
    try {
      val s = CharsetSniff.decodeUtf8(bytes, 0, bytes.length)
      var i = 0
      val rows = Seq.newBuilder[Seq[String]]
      var arity = -1
      while (i < s.length) {
        val fields = Seq.newBuilder[String]
        var endOfRecord = false
        while (!endOfRecord) {
          val sb = new StringBuilder
          if (i < s.length && s(i) == '"') {
            i += 1
            var closed = false
            while (!closed) {
              if (i >= s.length) throw Malformed // unterminated quote
              val c = s(i)
              if (c == '"') {
                if (i + 1 < s.length && s(i + 1) == '"') { sb += '"'; i += 2 }
                else { closed = true; i += 1 }
              } else { sb += c; i += 1 }
            }
            // after the closing quote: separator or end of record only
            if (i < s.length && s(i) != ',' && s(i) != '\n' && s(i) != '\r')
              throw Malformed
          } else {
            var done = false
            while (!done) {
              if (i >= s.length || s(i) == ',' || s(i) == '\n' || s(i) == '\r')
                done = true
              else if (s(i) == '"') throw Malformed // bare quote: never guessed
              else { sb += s(i); i += 1 }
            }
          }
          fields += sb.toString
          if (i >= s.length) endOfRecord = true
          else s(i) match {
            case ',' => i += 1
            case '\r' =>
              if (i + 1 >= s.length || s(i + 1) != '\n') throw Malformed
              i += 2
              endOfRecord = true
            case '\n' => i += 1; endOfRecord = true
            case _ => throw Malformed
          }
        }
        val row = fields.result()
        if (arity < 0) arity = row.size
        else if (row.size != arity) throw Malformed // the ragged-row rule
        rows += row
      }
      val out = rows.result()
      if (out.isEmpty) throw Malformed
      Some(out)
    } catch {
      case Malformed => None
      case _: Throwable => None
    }

  private def needsQuote(f: String): Boolean =
    f.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r')

  private[graft] def encode(rows: Seq[Seq[String]]): Array[Byte] = {
    val sb = new StringBuilder
    rows.foreach { row =>
      sb.append(row.map { f =>
        if (needsQuote(f)) "\"" + f.replace("\"", "\"\"") + "\""
        else f
      }.mkString(","))
      sb.append('\n')
    }
    sb.toString.getBytes("UTF-8")
  }
}

/** In-plan synthesizer + gate for d151: each doc a labeled shard of
  * K = 4 + doc_id%6 data rows (id, name, val, tag) where every third
  * name needs quoting (embedded comma+quote+newline) and the final
  * row's tag is always quoted; decoded back strict and aggregated.
  * Damage %7: 0 → truncation (lands inside the final quoted tag —
  * the unterminated-quote rule); 3 → a BARE QUOTE planted mid
  * unquoted field (lenient parsers guess; ours quarantines); 5 → a
  * RAGGED ROW (every field well-formed — only the arity rule catches
  * the column shift that silently relabels data). */
object CsvSim {

  private[graft] def k(docId: Long): Int = (4 + docId % 6).toInt

  private[graft] def name(docId: Long, i: Int): String =
    if (i % 3 == 0) s"""n,"${docId + i}"\nx"""
    else s"name_${docId}_$i"

  private[graft] def rowsFor(docId: Long): Seq[Seq[String]] =
    (0 until k(docId)).map { i =>
      Seq((docId * 10 + i).toString, name(docId, i),
        (((docId + i) % 40) * 0.25).toString, s"t${(docId + i) % 5}")
    } :+ Seq((docId * 10 + k(docId)).toString, "tail",
      "0.0", s"z,${docId % 9}") // the quoted final tag

  private[graft] def payloadFor(docId: Long): Array[Byte] = {
    val mode = docId % 7
    val clean = CsvCodec.encode(rowsFor(docId))
    mode match {
      case 0 => java.util.Arrays.copyOf(clean, clean.length - 3)
      case 3 =>
        // plant a bare quote inside the first unquoted name field
        val s = new String(clean, "UTF-8")
        s.replaceFirst("name_", "na\"me_").getBytes("UTF-8")
      case 5 =>
        val s = new String(clean, "UTF-8")
        // one extra field on the SECOND line (the first data row is
        // quoted-name and multi-line; line 4 of the text is a plain row)
        val lines = s.split("\n", -1)
        val idx = lines.indexWhere(l => l.startsWith((docId * 10 + 1).toString))
        lines.updated(idx, lines(idx) + ",extra").mkString("\n").getBytes("UTF-8")
      case _ => clean
    }
  }

  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_rows", LongType),
    StructField("sum_ids", LongType),
    StructField("sum_vals", DoubleType),
    StructField("name_chars", LongType)))

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
                CsvCodec.decode(payloadFor(id)).map { rows =>
                  var sumIds = 0L
                  var sumVals = 0.0
                  var nameChars = 0L
                  rows.foreach { row =>
                    if (row.size != 4) throw CsvCodec.Malformed
                    sumIds += java.lang.Long.parseLong(row(0))
                    sumVals += java.lang.Double.parseDouble(row(2))
                    nameChars += row(1).length
                  }
                  Row(id, rows.size.toLong, sumIds, sumVals, nameChars)
                }
              } catch { case _: Throwable => None }
            out.iterator
          }
        }
      }(enc)
  }
}
