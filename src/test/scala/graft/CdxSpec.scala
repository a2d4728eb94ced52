package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CdxCodec, CdxSim, Sha1, Surt}

/** d136: SHA-1/Base32 pinned against the JDK, the SURT rules, the
  * CDX-11 grammar incl. the sort-order requirement, and the serve
  * path's three damage classes. */
class CdxSpec extends AnyFunSuite {

  test("SHA-1 matches java.security.MessageDigest across block boundaries") {
    val rnd = new java.util.Random(11)
    val md = java.security.MessageDigest.getInstance("SHA-1")
    for (n <- Seq(0, 1, 54, 55, 56, 63, 64, 65, 119, 120, 1000, 10000)) {
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      md.reset()
      assert(java.util.Arrays.equals(Sha1.hash(b, 0, n), md.digest(b)),
        s"sha1 mismatch at n=$n")
    }
    // the canonical empty-string vector, via the WARC convention
    assert(Sha1.warcDigest(Array.empty, 0, 0) ==
      "sha1:3I42H3S6NNFQ2MSVX7XZKYAYSCX5QBYJ")
  }

  test("SURT: every canonicalization rule, and malformed URLs quarantine") {
    assert(Surt.canonicalize("http://WWW.Example5.COM/Doc/3") == "com,example5)/doc/3")
    assert(Surt.canonicalize("http://example5.com:80/doc/1?b=2&a=1") ==
      "com,example5)/doc/1?a=1&b=2")
    assert(Surt.canonicalize("https://sub.example5.com:8443/doc/2") ==
      "com,example5,sub:8443)/doc/2")
    assert(Surt.canonicalize("http://example5.com/doc/0?jsessionid=ABC123&z=9&") ==
      "com,example5)/doc/0?z=9")
    assert(Surt.canonicalize("http://example5.com/doc/4#frag") == "com,example5)/doc/4")
    assert(Surt.canonicalize("https://a.b.c/") == "c,b,a)/")
    assert(Surt.canonicalize("http://www2.x.org") == "org,x)/")
    assert(Surt.canonicalize("https://x.org:443/p") == "org,x)/p")
    for (u <- Seq("ftp://x.com/", "http:///p", "http://host:x/", "nourl",
        "http://a..b/", "http://.a/"))
      assertThrows[Throwable](Surt.canonicalize(u))
  }

  test("the serve path verifies every capture; all three damage classes fail") {
    val text = "alpha bravo charlie delta echo foxtrot golf hotel india " * 4
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val (shard, cdx) = CdxSim.payloadFor(docId, text)
      val entries = CdxCodec.parse(cdx)
      assert(entries.size == CdxSim.nCaptures(docId))
      val sl = CdxSim.slices(docId, text)
      entries.foreach { e =>
        val body = CdxCodec.serve(shard, e)
        val i = "/doc/(\\d+)".r.findFirstMatchIn(e.urlkey).get.group(1).toInt
        assert(new String(body, "UTF-8") == sl(i), s"doc $docId capture $i body")
      }
    }
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L)) {
      assertThrows[Throwable] {
        val (shard, cdx) = CdxSim.payloadFor(docId, text)
        CdxCodec.parse(cdx).foreach(e => CdxCodec.serve(shard, e))
      }
    }
  }

  test("an unsorted index quarantines at parse") {
    val (_, cdx) = CdxSim.payloadFor(1L, "some text across captures here ok")
    val lines = cdx.split("\n", -1)
    assume(lines.length > 4)
    val swapped = (lines(0) +: lines(2) +: lines(1) +: lines.drop(3).toSeq)
      .mkString("\n")
    assertThrows[Throwable](CdxCodec.parse(swapped))
  }
}
