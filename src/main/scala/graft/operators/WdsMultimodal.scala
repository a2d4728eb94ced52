package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** d118 — the multimodal WebDataset capstone: the d114 crawl-capstone
  * analog for IMAGES, the ingest story a 100 TB image corpus runs.
  * Tar shards (d104's USTAR walk) whose members are REAL JPEG (d101)
  * and PNG (d98) payloads are walked, every member image is decoded
  * with the real codecs, decoded-PIXEL identity dedup keeps one copy
  * per distinct image (d21's md5-min-keeper applied to decoded
  * content — NOT bytes: the sim re-encodes the same image in
  * byte-DIFFERENT variants, JPEG with/without restart markers and PNG
  * under shifted filter schedules, and the chain must still collapse
  * them, which a byte-level dedup cannot), and survivors pack into
  * fixed-pixel-budget shards via the two-phase distributed prefix sum
  * (d19/d114's packBudgetScalable — no one-task-per-stream window
  * wall). Every stage's arithmetic is an already-proven oracle piece:
  * the JPEG solid-tile closed form (kinds 0/1 only — the exact-sum
  * slice of d101), the PNG gradient closed form (d98), tar member
  * grouping (d104/d105), the min-keeper (d21/d114), the prefix-sum
  * packing (d19).
  *
  * Member damage slice: (doc_id+i)%11==0 members are truncated inside
  * the shard — the strict decoders quarantine them and they
  * contribute nothing downstream (d114's page-drop shape).
  *
  * 100 TB: the shard walk + decode + fingerprint is ONE map-only
  * flatMap (ingest parallelism IS scan parallelism); the dedup
  * aggregation is partial-agg (a billion copies of one image collapse
  * map-side); the keeper set is content-bounded (distinct images),
  * not corpus-bounded.
  */
object WdsSim {

  private[graft] def nMembers(docId: Long): Int = (2 + docId % 4).toInt

  private[graft] def isJpg(docId: Long, i: Int): Boolean = (docId + i) % 2 == 0

  /** Truncated-member slice — decoder-quarantined inside the shard. */
  private[graft] def isDamaged(docId: Long, i: Int): Boolean =
    (docId + i) % 11 == 0

  /** Byte-different re-encoding of the SAME image: JPEG gains restart
    * markers, PNG shifts its filter schedule. Decoded pixels are
    * identical by construction — the dedup must merge variants. */
  private[graft] def variant(docId: Long, i: Int): Boolean =
    (docId + i) % 3 == 1

  /** JPEG image id: 3k+b keeps kind = jid%3 in {0,1} — the exact
    * closed-form slice (solid tiles; kind 2's gradient sums are only
    * verdict-bounded). Modulus 240 < 256 guarantees distinct jids
    * decode to distinct pixels (the tile-color map is injective mod
    * 256 and the DC rounding can only collide across an all-odd/even
    * pair, which single-tile jids never form — see the d118 spec). */
  private[graft] def jpgId(docId: Long, i: Int): Long =
    3L * ((docId * 5 + i * 11) % 80) + (docId + i) % 2

  /** PNG image id: modulus 120 < 256 — pixel (0,0)'s r channel is
    * pid%256, so distinct pids decode to distinct pixels. */
  private[graft] def pngId(docId: Long, i: Int): Long =
    (docId * 7 + i * 13) % 120

  private[graft] def memberBytes(docId: Long, i: Int): Array[Byte] = {
    val clean = if (isJpg(docId, i)) {
      val jid = jpgId(docId, i)
      val (w, h) = JpegSim.dims(jid)
      JpegCodec.encode(w, h, JpegSim.raster(jid, w, h),
        comps = if (JpegSim.kind(jid) == 0) 1 else 3,
        restartInterval = if (variant(docId, i)) 3 else 0)
    } else {
      val pid = pngId(docId, i)
      val (w, h) = PngSim.dims(pid)
      val ct = PngSim.colorType(pid)
      PngCodec.encode(w, h, PngSim.rasterOf(pid, w, h, ct),
        y => ((pid + y + (if (variant(docId, i)) 1 else 0)) % 5).toInt,
        colorType = ct)
    }
    if (isDamaged(docId, i)) java.util.Arrays.copyOf(clean, clean.length / 2)
    else clean
  }

  /** One WebDataset shard per doc: REAL tar bytes of REAL image
    * bytes, keys `dddddddd_ii.jpg|png`. */
  private[graft] def shardFor(docId: Long): Array[Byte] =
    TarCodec.encode((0 until nMembers(docId)).map { i =>
      val ext = if (isJpg(docId, i)) "jpg" else "png"
      f"$docId%08d_$i%02d.$ext" -> memberBytes(docId, i)
    })

  val sampleSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("member", IntegerType),
    StructField("fmt", StringType),
    StructField("img_w", IntegerType),
    StructField("img_h", IntegerType),
    StructField("sum_r", LongType),
    StructField("fp", StringType),
    StructField("pid", LongType)))

  /** Shard → decoded per-image rows: build the tar IN-PLAN, walk it
    * with the strict d104 decoder, decode every member with the real
    * JPEG/PNG codecs, fingerprint the DECODED pixels (md5 over
    * fmt/dims/layout/bytes — content identity through the codec
    * layer). Damaged members decode to None and vanish. ONE map-only
    * flatMap: no exchange at any corpus size. */
  def imageSamples(spark: SparkSession, docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(sampleSchema)
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.grouped(Multimodal.BATCH_SIZE).flatMap { batch =>
          batch.iterator.flatMap { r =>
            val id = r.getLong(0)
            TarCodec.decode(shardFor(id)) match {
              case Some(ms) =>
                ms.flatMap { case (name, bytes) =>
                  val dot = name.lastIndexOf('.')
                  val ext = name.substring(dot + 1)
                  val member = name.substring(dot - 2, dot).toInt
                  val dec =
                    if (ext == "jpg") JpegCodec.decodeNative(bytes)
                    else PngCodec.decodeNative(bytes).map { case (w, h, ct, px) =>
                      (w, h, ct match { case 0 => 1; case 2 => 3; case _ => 4 }, px)
                    }
                  dec.map { case (w, h, nc, px) =>
                    var sumR = 0L
                    var j = 0
                    while (j < px.length) { sumR += px(j) & 0xFF; j += nc }
                    val md = java.security.MessageDigest.getInstance("MD5")
                    md.update(ext.getBytes("US-ASCII"))
                    md.update(Array[Byte](w.toByte, (w >> 8).toByte,
                      h.toByte, (h >> 8).toByte, nc.toByte))
                    md.update(px)
                    val fp = md.digest().map(b => f"$b%02x").mkString
                    Row(id, member, ext, w, h, sumR, fp, id * 8L + member)
                  }
                }
              case None => Nil // shard-level quarantine (none in d118's sim)
            }
          }
        }
      }(enc)
  }

  /** The full d118 chain: decode rows → pixel-identity dedup
    * (min-pid keeper, partial-agg) → pixel-budget packing per format
    * stream. Output: one row per KEPT image with its duplicate count
    * and shard assignment. */
  def pipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    val imgs = imageSamples(spark, docs)
    val keepers = imgs.groupBy(col("fp"))
      .agg(min(col("pid")).as("pid"), count(lit(1)).as("n_copies"))
    val kept = imgs.join(keepers.select(col("pid"), col("n_copies")),
      Seq("pid"), "inner")
    TextOps.packBudgetScalable(kept, col("fmt"), col("pid"),
        (col("img_w") * col("img_h")).cast("long"), budget = 4096)
      .select(col("doc_id"), col("member"), col("fmt"),
        col("img_w"), col("img_h"), col("sum_r"), col("n_copies"),
        col("pack_id").cast("long").as("shard_id"))
  }
}
