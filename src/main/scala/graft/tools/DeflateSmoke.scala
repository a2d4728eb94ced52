// Dev harness for the d124 codec (the ZstdSmoke pattern): exhaustive
// checks too slow for the property suite — every-bit flip sweeps,
// every-prefix truncation sweeps, all JDK levels/strategies both
// directions, and a single-thread throughput figure. Run:
//   java -cp target/scala-2.13/classes:/opt/spark/jars/\* graft.tools.DeflateSmoke
package graft.tools

object DeflateSmoke {
  def main(args: Array[String]): Unit = {
    import graft.operators.{DeflateCodec, DeflateSim}
    val rnd = new java.util.Random(42)
    var fails = 0
    def fail(msg: String): Unit = { fails += 1; println(s"FAIL $msg") }

    def jdkInflate(b: Array[Byte]): Option[Array[Byte]] = {
      val inf = new java.util.zip.Inflater()
      inf.setInput(b)
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      try {
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && !inf.finished()) return None
          bos.write(buf, 0, n)
        }
        Some(bos.toByteArray)
      } catch {
        case _: java.util.zip.DataFormatException => None
      } finally inf.end()
    }

    def jdkDeflate(content: Array[Byte], level: Int, strategy: Int): Array[Byte] = {
      val d = new java.util.zip.Deflater(level)
      d.setStrategy(strategy)
      d.setInput(content)
      d.finish()
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
      d.end()
      bos.toByteArray
    }

    def check(name: String, content: Array[Byte], cut: Int): Unit = {
      val enc = try DeflateCodec.zlibEncode(content, cut) catch {
        case e: Throwable => fail(s"$name: encode threw $e"); return
      }
      // 1. our decode
      DeflateCodec.zlibDecodeCounted(enc) match {
        case Some((got, nb)) =>
          if (!java.util.Arrays.equals(got, content))
            fail(s"$name: self roundtrip WRONG BYTES (len=${content.length} cut=$cut)")
          val want = math.max(1, (content.length + cut - 1) / cut)
          if (nb != want) fail(s"$name: block count $nb != $want")
        case None => fail(s"$name: self decode quarantined (len=${content.length} cut=$cut)")
      }
      // 2. the JDK (zlib itself) decodes ours
      jdkInflate(enc) match {
        case Some(got) if java.util.Arrays.equals(got, content) => ()
        case Some(_) => fail(s"$name: JDK decode of our stream WRONG BYTES")
        case None => fail(s"$name: JDK rejected our stream (len=${content.length} cut=$cut)")
      }
      // 3. we decode every JDK level/strategy (stored, fixed, dynamic paths)
      import java.util.zip.Deflater.{DEFAULT_STRATEGY, FILTERED, HUFFMAN_ONLY}
      for (lvl <- Seq(0, 1, 6, 9); strat <- Seq(DEFAULT_STRATEGY, FILTERED, HUFFMAN_ONLY)) {
        val jdk = jdkDeflate(content, lvl, strat)
        DeflateCodec.zlibDecode(jdk) match {
          case Some(got) if java.util.Arrays.equals(got, content) => ()
          case Some(_) => fail(s"$name lvl$lvl/s$strat: WRONG BYTES decoding JDK stream")
          case None => fail(s"$name lvl$lvl/s$strat: JDK stream quarantined (len=${content.length})")
        }
      }
    }

    // deterministic content families
    check("empty", Array.emptyByteArray, 100)
    check("one", Array[Byte](65), 100)
    check("run", Array.fill[Byte](500)('a'), 128)
    val abab = (0 until 3000).map(i => ("ab"(i % 2)).toByte).toArray
    check("abab", abab, 600)
    val text = ("the quick brown fox jumps over the lazy dog. " * 40).getBytes("UTF-8")
    check("text", text, 700)
    val rand = { val a = new Array[Byte](2048); rnd.nextBytes(a); a }
    check("random", rand, 900)
    val mixed = (text ++ rand ++ text).clone()
    check("mixed", mixed, 1000)
    val skew = Array.tabulate[Byte](4000)(i => "aaaaaaaabbbbccde"(rnd.nextInt(16)).toByte)
    check("skew", skew, 999)
    // single-block and giant-block shapes
    check("bigcut", text, 1 << 16)
    check("unit", text, 1) // one block per byte — header-dominated
    // deep-Huffman stress: Fibonacci-ish frequencies force the 15-bit
    // limit path (halve-and-retry) in a single large block
    val fib = {
      val bos = new java.io.ByteArrayOutputStream()
      var a = 1L; var b = 1L
      var s = 0
      while (s < 24 && bos.size() < 200000) {
        var k = 0L
        while (k < a && bos.size() < 200000) { bos.write(s); k += 1 }
        val t = a + b; a = b; b = t; s += 1
      }
      bos.toByteArray
    }
    check("fib", fib, 1 << 18)

    // damage modes: the three slices quarantine, both inflaters agree
    // on the structural ones
    for (id <- 0L until 28L) {
      val t = s"doc $id body line one\nline two with words $id\n" * 6
      val p = DeflateSim.payloadFor(id, t)
      val ours = DeflateCodec.zlibDecode(p)
      if (id % 7 == 0 || id % 7 == 3 || id % 7 == 5) {
        if (ours.nonEmpty) fail(s"damage id=$id decoded instead of quarantining")
        if (jdkInflate(p).nonEmpty && id % 7 != 0)
          fail(s"damage id=$id: JDK accepted the damaged stream")
      } else if (ours.isEmpty) fail(s"clean id=$id quarantined")
    }

    // exhaustive bit-flip sweep: every flip quarantines or decodes
    // identically (Adler-32 covers the content)
    val sweepContent = ("flip sweep body " * 20).getBytes("UTF-8")
    val sweepEnc = DeflateCodec.zlibEncode(sweepContent, 120)
    var flips = 0; var quarantined = 0; var identical = 0
    for (byteI <- sweepEnc.indices; bitI <- 0 until 8) {
      val d = sweepEnc.clone()
      d(byteI) = (d(byteI) ^ (1 << bitI)).toByte
      flips += 1
      DeflateCodec.zlibDecode(d) match {
        case None => quarantined += 1
        case Some(got) if java.util.Arrays.equals(got, sweepContent) => identical += 1
        case Some(_) => fail(s"bit flip at $byteI.$bitI decoded to WRONG CONTENT")
      }
    }
    println(s"flip sweep: $flips flips, $quarantined quarantined, $identical identical")

    // exhaustive truncation sweep: EVERY proper prefix quarantines
    // (zlib has a trailer — unlike Avro/snappy there is no valid cut)
    for (k <- 0 until sweepEnc.length) {
      if (DeflateCodec.zlibDecode(java.util.Arrays.copyOf(sweepEnc, k)).nonEmpty)
        fail(s"truncation to $k bytes decoded")
    }

    // throughput (single-thread)
    val big = {
      val bos = new java.io.ByteArrayOutputStream()
      while (bos.size() < (1 << 24)) bos.write(text)
      bos.toByteArray
    }
    var t0 = System.nanoTime()
    val bigEnc = DeflateCodec.zlibEncode(big, 1 << 16)
    val encMBs = big.length / 1e6 / ((System.nanoTime() - t0) / 1e9)
    t0 = System.nanoTime()
    val back = DeflateCodec.zlibDecode(bigEnc)
    val decMBs = big.length / 1e6 / ((System.nanoTime() - t0) / 1e9)
    if (back.isEmpty || !java.util.Arrays.equals(back.get, big)) fail("big roundtrip")
    println(f"throughput: encode $encMBs%.1f MB/s, decode $decMBs%.1f MB/s, ratio ${bigEnc.length.toDouble / big.length}%.3f")

    println(if (fails == 0) "ALL OK" else s"$fails FAILURES")
    if (fails > 0) sys.exit(1)
  }
}
