package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** d143: dictionary-compressed zstd — the dictionary format parse,
  * dict-seeded decode/encode, the damage classes, and interop BOTH
  * directions against zstd-jni (incl. ZDICT-trained dictionaries). */
class ZstdDictSpec extends AnyFunSuite {

  private val TEXT =
    "a modest document body\nwith a few lines of text\nand one more line"

  test("gate roundtrip: dict frames decode to the records; the dictionary pays") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val blob = ZstdJsonlSim.jsonlBytes(docId, TEXT)
      val withDict = ZstdCodec.encodeFrameWithDict(blob, ZstdDictSim.DICT,
        ZstdDictSim.blockCut(docId))
      val bare = ZstdCodec.encodeFrame(blob, ZstdDictSim.blockCut(docId))
      assert(ZstdCodec.decodeWithDict(withDict, ZstdDictSim.DICT)
        .map(_.toSeq).contains(blob.toSeq))
      // the shared scaffold collapses into dictionary matches
      assert(withDict.length < bare.length,
        s"doc $docId: dict ${withDict.length} vs bare ${bare.length}")
      // the bare decoder must NOT accept a dict frame (it names a
      // dictionary it doesn't hold)
      assert(ZstdCodec.decode(withDict).isEmpty)
    }
  }

  test("damage classes: truncation, the lying dictID, the corrupt dictionary") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L)) {
      val dict = if (docId % 7 == 5) ZstdDictSim.CORRUPT_DICT else ZstdDictSim.DICT
      assert(ZstdCodec.decodeWithDict(
        ZstdDictSim.payloadFor(docId, TEXT), dict).isEmpty,
        s"doc $docId should quarantine")
    }
    for (docId <- Seq(5L, 12L, 19L)) {
      assert(ZstdCodec.decodeWithDict(
        ZstdDictSim.payloadFor(docId, TEXT), ZstdDictSim.CORRUPT_DICT).isEmpty,
        s"doc $docId with the flipped dictionary must fail its checksum")
    }
    // the %7==3 lie is ONLY the id: the same frame decodes against a
    // dictionary registered under the lied-to id
    val lied = ZstdDictSim.payloadFor(3L, TEXT)
    assert(ZstdCodec.decodeWithDict(lied,
      ZstdCodec.rawDict(ZstdDictSim.DICT_TEXT.getBytes("UTF-8"), 778L))
      .isDefined)
  }

  // ---------------------------------------------------------- zstd-jni

  import com.github.luben.zstd.{Zstd, ZstdCompressCtx, ZstdDecompressCtx, ZstdDictTrainer}

  private def samples: Seq[Array[Byte]] =
    (0 until 220).map { i =>
      (s"""{"id":${1000 + i},"text":"the quick brown fox number $i jumps """ +
        s"""over the lazy dog and then some more shared corpus prose"}""")
        .getBytes("UTF-8")
    }

  private lazy val trainedDict: Array[Byte] = {
    val t = new ZstdDictTrainer(1 << 20, 4096)
    samples.foreach(t.addSample)
    t.trainSamples()
  }

  test("interop: a ZDICT-trained dictionary parses through our structured reader") {
    val parsed = ZstdCodec.parseDictionary(trainedDict)
      .getOrElse(fail("trained dictionary quarantined"))
    assert(parsed.id != 0)
    assert(parsed.id == Zstd.getDictIdFromDict(trainedDict))
    assert(parsed.content.nonEmpty)
    assert(parsed.huff != null && parsed.ofT != null && parsed.mlT != null &&
      parsed.llT != null)
    // a truncated structured dictionary quarantines (never a raw fallback)
    assert(ZstdCodec.parseDictionary(
      java.util.Arrays.copyOf(trainedDict, trainedDict.length / 2)).isEmpty ||
      // truncation inside the CONTENT region still parses (shorter
      // content) — but truncation inside the tables must quarantine
      ZstdCodec.parseDictionary(
        java.util.Arrays.copyOf(trainedDict, 16)).isEmpty)
    assert(ZstdCodec.parseDictionary(
      java.util.Arrays.copyOf(trainedDict, 16)).isEmpty)
  }

  test("interop 1: libzstd frames compressed WITH the trained dictionary decode through our walker") {
    val parsed = ZstdCodec.parseDictionary(trainedDict).get
    val cctx = new ZstdCompressCtx()
    try {
      cctx.loadDict(trainedDict)
      cctx.setLevel(3)
      samples.take(40).zipWithIndex.foreach { case (s, i) =>
        val frame = cctx.compress(s)
        val back = ZstdCodec.decodeWithDict(frame, parsed,
          requireChecksum = false)
          .getOrElse(fail(s"sample $i quarantined"))
        assert(back.toSeq == s.toSeq, s"sample $i bytes diverge")
      }
    } finally cctx.close()
    // the WRONG dictionary must not decode them: the id check fires
    val cctx2 = new ZstdCompressCtx()
    try {
      cctx2.loadDict(trainedDict); cctx2.setLevel(3)
      val frame = cctx2.compress(samples.head)
      assert(ZstdCodec.decodeWithDict(frame,
        ZstdCodec.rawDict("not the dictionary".getBytes, 42L),
        requireChecksum = false).isEmpty)
    } finally cctx2.close()
  }

  test("interop 2: our dict-compressed frames decompress through libzstd") {
    val rawBytes = ZstdDictSim.DICT_TEXT.getBytes("UTF-8")
    val dict0 = ZstdCodec.rawDict(rawBytes) // id 0: no header id stamped
    for (docId <- Seq(1L, 2L, 6L, 9L)) {
      val blob = ZstdJsonlSim.jsonlBytes(docId, TEXT)
      val frame = ZstdCodec.encodeFrameWithDict(blob, dict0,
        ZstdDictSim.blockCut(docId))
      val dctx = new ZstdDecompressCtx()
      try {
        dctx.loadDict(rawBytes)
        val back = dctx.decompress(frame, blob.length)
        assert(back.toSeq == blob.toSeq, s"doc $docId bytes diverge")
      } finally dctx.close()
    }
  }
}
