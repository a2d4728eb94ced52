package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._
import graft.operators.Bencode._

/** d153: bencode + torrent metainfo — the canonical grammar, the
  * piece-hash and infohash audits, and the damage classes. */
class TorrentSpec extends AnyFunSuite {

  test("bencode roundtrip and canonical grammar") {
    val v = BDict(Seq(
      "a" -> BInt(-42),
      "b" -> BList(Seq(BInt(0), BStr("x:y".getBytes))),
      "c" -> BStr(Array[Byte](0, 1, 2))))
    assert(Bencode.decode(Bencode.encode(v)).contains(v))
    assert(new String(Bencode.encode(BInt(7))) == "i7e")
    for (bad <- Seq("i03e", "i-0e", "ie", "i1", "01:x", "3:ab",
      "d1:bi1e1:ai2ee", // unsorted keys
      "d1:ai1e1:ai2ee", // duplicate keys
      "li1ee x", "lxe", "d1:ae"))
      assert(Bencode.decode(bad.getBytes("US-ASCII")).isEmpty, bad)
  }

  test("metainfo verify: the gate roundtrip and the count-vs-length rule") {
    val payload = ("piece content " * 100).getBytes("UTF-8")
    val meta = TorrentMeta.build("https://t/a", "f.bin", 300, payload)
    val m = TorrentMeta.verify(meta, payload).getOrElse(fail("quarantined"))
    assert(m.nPieces == (payload.length + 299) / 300)
    assert(m.length == payload.length)
    assert(m.infoHash.length == 20)
    // a payload that isn't the declared content
    assert(TorrentMeta.verify(meta,
      java.util.Arrays.copyOf(payload, payload.length - 1)).isEmpty)
    // one flipped payload byte → a piece hash no longer matches
    val bad = payload.clone(); bad(500) = (bad(500) ^ 1).toByte
    assert(TorrentMeta.verify(meta, bad).isEmpty)
  }

  test("damage classes: truncation, the lying piece hash, the unsorted info dict") {
    val text = "document body for the torrent damage classes " * 8
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L)) {
      val (meta, payload) = TorrentSim.payloadFor(docId, text)
      assert(TorrentMeta.verify(meta, payload).isEmpty,
        s"doc $docId should quarantine")
    }
    for (docId <- Seq(1L, 2L, 6L, 9L)) {
      val (meta, payload) = TorrentSim.payloadFor(docId, text)
      assert(TorrentMeta.verify(meta, payload).isDefined)
    }
  }

  test("every metainfo truncation quarantines") {
    val (meta, payload) = TorrentSim.payloadFor(1L, "some payload text here")
    (0 until meta.length).foreach { cut =>
      assert(TorrentMeta.verify(java.util.Arrays.copyOf(meta, cut),
        payload).isEmpty, s"cut $cut")
    }
  }
}
