package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** d143 — DICTIONARY-compressed zstd (`.jsonl.zst` shards with a
  * shared dictionary): the way small-record corpora actually compress
  * at 100 TB. A lone 200-byte JSON record compresses terribly (no
  * history to match against); a corpus-trained DICTIONARY shipped once
  * per dataset gives every record a shared match-history prefix and
  * entropy priors (RFC 8878 §5). Built on the r12 from-scratch zstd:
  *
  *  - the DICTIONARY FORMAT read path ([[ZstdCodec.parseDictionary]]):
  *    magic 0xEC30A437, a mandatory nonzero dictID, entropy tables in
  *    the spec's order (huff0 literals, FSE offsets / match lengths /
  *    literals lengths — seeding the frame's Treeless/Repeat modes),
  *    three replacement repcodes each bounded by the content, then the
  *    content itself; bytes without the magic are a RAW-CONTENT
  *    dictionary (spec-legal — just a prefix);
  *  - decode against a dictionary ([[ZstdCodec.decodeWithDict]]): the
  *    content prefixes the match window, the entropy context and
  *    repcodes seed from the dictionary, and a frame-header dictID
  *    must MATCH — the id exists exactly so the wrong dictionary can't
  *    decode plausible garbage;
  *  - encode against a dictionary ([[ZstdCodec.encodeFrameWithDict]]):
  *    the matcher's hash table is seeded over the dictionary so
  *    matches reach back into it (measured on the gate corpus: the
  *    scaffold of every JSONL record collapses to dictionary matches),
  *    and the dictID is stamped into the frame header.
  *
  * Interop pinned BOTH directions against zstd-jni (the library on
  * Spark's own classpath): ZDICT-TRAINED dictionaries parse through
  * our structured-format reader field-for-field (id cross-checked with
  * Zstd.getDictIdFromDict), libzstd frames compressed WITH a trained
  * dictionary — dict entropy tables, dict matches, dict repcodes —
  * decode through our dict decoder byte-exactly, and our
  * dict-compressed frames decompress through libzstd (ZstdDictSpec).
  */
object ZstdDictSim {

  /** The shared "corpus dictionary" for the gate: the JSONL scaffold
    * every record carries plus high-frequency English — a raw-content
    * dictionary with a registry id. Its FIRST bytes are the scaffold
    * (`{"id":`), so every record's opening bytes match at offset 0. */
  private[graft] val DICT_ID = 777L
  private[graft] val DICT_TEXT: String =
    """{"id":1234567890,"text":"the quick brown fox jumps over the """ +
      """lazy dog and then the of to in a is that for it as was with be """ +
      """by on not he this are or his from at which but have an had they """ +
      """you were their one all we can her has there been if more when """ +
      """will would who so no out up into them about"}""" + "\n"

  private[graft] lazy val DICT =
    ZstdCodec.rawDict(DICT_TEXT.getBytes("UTF-8"), DICT_ID)

  /** The %7==5 damage: the SAME dictionary, one scaffold byte flipped
    * — every frame byte intact; the dictionary is part of the decode
    * state, so the first record's scaffold match copies the flipped
    * byte and the frame's own content checksum catches it. */
  private[graft] lazy val CORRUPT_DICT = {
    val c = DICT_TEXT.getBytes("UTF-8")
    c(2) = (c(2) ^ 0x20).toByte // inside the `{"id":` scaffold match
    ZstdCodec.rawDict(c, DICT_ID)
  }

  private[graft] def blockCut(docId: Long): Int = (550 + docId % 450).toInt

  private[graft] def payloadFor(docId: Long, text: String): Array[Byte] = {
    val blob = ZstdJsonlSim.jsonlBytes(docId, text)
    val clean = ZstdCodec.encodeFrameWithDict(blob, DICT, blockCut(docId))
    (docId % 7) match {
      case 0 => java.util.Arrays.copyOf(clean, clean.length - 3)
      case 3 =>
        // the LYING DICT ID: id 777 needs the 2-byte form, little-endian
        // at bytes [5,6] of the single-segment header — bump the low
        // byte; every other byte intact, only the id check catches it
        val d = clean.clone(); d(5) = (d(5) + 1).toByte; d
      case _ => clean
    }
  }

  val lineSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("line", StringType)))

  /** The row source: dict-decode → one row per JSONL record line.
    * Damaged docs (truncation / lying dictID / corrupt dictionary)
    * yield nothing. */
  def lines(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(lineSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            val dict = if (id % 7 == 5) CORRUPT_DICT else DICT
            ZstdCodec.decodeWithDict(payloadFor(id, r.getString(1)),
              dict) match {
              case Some(blob) =>
                new String(blob, "UTF-8").split("\n", -1).toSeq
                  .map(l => Row(id, l))
              case None => Nil
            }
          }
        }
      }(enc)
  }
}
