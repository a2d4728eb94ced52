// Dev harness for the d125 codec (the DeflateSmoke pattern): exhaustive
// bit-flip and truncation sweeps, commons-compress interop both
// directions at every level, and a throughput figure. Run:
//   java -cp target/scala-2.13/classes:/opt/spark/jars/\* graft.tools.Bzip2Smoke
package graft.tools

object Bzip2Smoke {
  def main(args: Array[String]): Unit = {
    import graft.operators.{Bzip2Codec, Bzip2Sim}
    val rnd = new java.util.Random(42)
    var fails = 0
    def fail(msg: String): Unit = { fails += 1; println(s"FAIL $msg") }

    def ccCompress(content: Array[Byte], level: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorOutputStream(bos, level)
      out.write(content); out.close()
      bos.toByteArray
    }

    def ccDecompress(b: Array[Byte]): Option[Array[Byte]] =
      try {
        val in = new org.apache.commons.compress.compressors.bzip2
          .BZip2CompressorInputStream(new java.io.ByteArrayInputStream(b), true)
        val acc = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { acc.write(buf, 0, n); n = in.read(buf) }
        in.close()
        Some(acc.toByteArray)
      } catch { case _: Exception => None }

    def check(name: String, content: Array[Byte], cut: Int): Unit = {
      val enc = try Bzip2Codec.encode(content, cut) catch {
        case e: Throwable => fail(s"$name: encode threw $e"); return
      }
      // 1. our decode, with the walked block count
      Bzip2Codec.decode(enc) match {
        case Some((got, nb)) =>
          if (!java.util.Arrays.equals(got, content))
            fail(s"$name: self roundtrip WRONG BYTES (len=${content.length} cut=$cut)")
          val want = (content.length + cut - 1) / cut
          if (nb != want) fail(s"$name: block count $nb != $want")
        case None => fail(s"$name: self decode quarantined (len=${content.length} cut=$cut)")
      }
      // 2. commons-compress reads ours
      ccDecompress(enc) match {
        case Some(got) if java.util.Arrays.equals(got, content) => ()
        case Some(_) => fail(s"$name: cc decode of our stream WRONG BYTES")
        case None => fail(s"$name: cc rejected our stream (len=${content.length} cut=$cut)")
      }
      // 3. we read commons-compress at every level (real multi-table,
      //    real selector schedules, real block splits)
      for (lvl <- Seq(1, 5, 9)) {
        val cc = ccCompress(content, lvl)
        Bzip2Codec.decode(cc) match {
          case Some((got, _)) if java.util.Arrays.equals(got, content) => ()
          case Some(_) => fail(s"$name lvl$lvl: WRONG BYTES decoding cc stream")
          case None => fail(s"$name lvl$lvl: cc stream quarantined (len=${content.length})")
        }
      }
    }

    check("empty", Array.emptyByteArray, 100)
    check("one", Array[Byte](65), 100)
    check("run", Array.fill[Byte](500)('a'), 128) // RLE1 territory
    check("run4", Array.fill[Byte](4)('x'), 100) // exact 4-run + count 0
    check("run259", Array.fill[Byte](259)('y'), 500) // max single RLE1 run + tail
    val abab = (0 until 3000).map(i => ("ab"(i % 2)).toByte).toArray
    check("abab", abab, 600) // periodic: the rotation-sort stress
    val text = ("the quick brown fox jumps over the lazy dog. " * 40).getBytes("UTF-8")
    check("text", text, 700)
    val rand = { val a = new Array[Byte](2048); rnd.nextBytes(a); a }
    check("random", rand, 900)
    check("mixed", text ++ rand ++ text, 1000)
    val allbytes = Array.tabulate[Byte](512)(i => i.toByte) // full 256 alphabet
    check("allbytes", allbytes, 512)
    check("bigcut", text, 1 << 16)

    // damage modes
    for (id <- 0L until 28L) {
      val t = s"doc $id body line one\nline two with words $id\n" * 6
      val p = Bzip2Sim.payloadFor(id, t)
      val ours = Bzip2Codec.decode(p)
      if (id % 7 == 0 || id % 7 == 3 || id % 7 == 5) {
        if (ours.nonEmpty) fail(s"damage id=$id decoded instead of quarantining")
      } else if (ours.isEmpty) fail(s"clean id=$id quarantined")
    }

    // exhaustive bit-flip sweep: quarantine or decode identically
    // (block CRC + combined CRC cover everything that matters)
    val sweepContent = ("flip sweep body " * 20).getBytes("UTF-8")
    val sweepEnc = Bzip2Codec.encode(sweepContent, 120)
    var flips = 0; var quarantinedN = 0; var identical = 0
    for (byteI <- sweepEnc.indices; bitI <- 0 until 8) {
      val d = sweepEnc.clone()
      d(byteI) = (d(byteI) ^ (1 << bitI)).toByte
      flips += 1
      Bzip2Codec.decode(d) match {
        case None => quarantinedN += 1
        case Some((got, _)) if java.util.Arrays.equals(got, sweepContent) =>
          identical += 1
        case Some(_) => fail(s"bit flip at $byteI.$bitI decoded to WRONG CONTENT")
      }
    }
    println(s"flip sweep: $flips flips, $quarantinedN quarantined, $identical identical")

    // exhaustive truncation sweep: every proper prefix quarantines
    // (the footer's combined CRC is a stream trailer)
    for (k <- 0 until sweepEnc.length) {
      if (Bzip2Codec.decode(java.util.Arrays.copyOf(sweepEnc, k)).nonEmpty)
        fail(s"truncation to $k bytes decoded")
    }

    // throughput (single-thread)
    val big = {
      val bos = new java.io.ByteArrayOutputStream()
      while (bos.size() < (1 << 22)) bos.write(text)
      bos.toByteArray
    }
    var t0 = System.nanoTime()
    val bigEnc = Bzip2Codec.encode(big, 1 << 16)
    val encMBs = big.length / 1e6 / ((System.nanoTime() - t0) / 1e9)
    t0 = System.nanoTime()
    val back = Bzip2Codec.decode(bigEnc)
    val decMBs = big.length / 1e6 / ((System.nanoTime() - t0) / 1e9)
    if (back.isEmpty || !java.util.Arrays.equals(back.get._1, big)) fail("big roundtrip")
    println(f"throughput: encode $encMBs%.1f MB/s, decode $decMBs%.1f MB/s, ratio ${bigEnc.length.toDouble / big.length}%.3f")

    println(if (fails == 0) "ALL OK" else s"$fails FAILURES")
    if (fails > 0) sys.exit(1)
  }
}
