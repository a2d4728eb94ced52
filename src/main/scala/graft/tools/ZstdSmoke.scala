// Dev harness for the d117 codec (the ScaleRehearsal pattern): the
// EXHAUSTIVE checks too slow for the property suite — every-bit flip
// sweeps over whole frames (the property spec samples) and a
// single-thread throughput figure. Run:
//   java -cp target/scala-2.13/classes:/opt/spark/jars/\* graft.tools.ZstdSmoke
package graft.tools

object ZstdSmoke {
  def main(args: Array[String]): Unit = {
    import graft.operators.{ZstdCodec, ZstdSim}
    val rnd = new java.util.Random(42)

    def check(name: String, content: Array[Byte], cut: Int): Unit = {
      val enc = try ZstdCodec.encodeFrame(content, cut) catch {
        case e: Throwable =>
          println(s"FAIL $name: encode threw $e"); return
      }
      // 1. our decode
      ZstdCodec.decode(enc) match {
        case Some(got) if java.util.Arrays.equals(got, content) => ()
        case Some(_) => println(s"FAIL $name: self roundtrip WRONG BYTES (len=${content.length} cut=$cut)")
        case None => println(s"FAIL $name: self decode quarantined (len=${content.length} cut=$cut encLen=${enc.length})")
      }
      // 2. zstd-jni decodes ours
      try {
        val got = com.github.luben.zstd.Zstd.decompress(enc, content.length.max(1))
        if (!java.util.Arrays.equals(got, content))
          println(s"FAIL $name: jni decode of our frame WRONG BYTES")
      } catch {
        case e: Throwable => println(s"FAIL $name: jni decode of our frame threw ${e.getMessage} (len=${content.length} cut=$cut)")
      }
      // 3. we decode zstd-jni (checksummed, several levels)
      for (lvl <- Seq(1, 3, 9, 19)) {
        val ctx = new com.github.luben.zstd.ZstdCompressCtx()
        ctx.setLevel(lvl); ctx.setChecksum(true)
        val jni = ctx.compress(content)
        ctx.close()
        ZstdCodec.decode(jni) match {
          case Some(got) if java.util.Arrays.equals(got, content) => ()
          case Some(_) => println(s"FAIL $name lvl$lvl: decode of jni frame WRONG BYTES")
          case None => println(s"FAIL $name lvl$lvl: jni frame quarantined (len=${content.length})")
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
    // skewed alphabet (huff0-friendly)
    val skew = Array.tabulate[Byte](4000)(i => "aaaaaaaabbbbccde"((rnd.nextInt(16))).toByte)
    check("skew", skew, 999)
    // unicode text
    check("utf8", ("héllo wörld — ünïcode ž " * 50).getBytes("UTF-8"), 601)
    // random sizes and cuts
    for (t <- 0 until 400) {
      val n = rnd.nextInt(5000)
      val mode = rnd.nextInt(4)
      val content = mode match {
        case 0 => val a = new Array[Byte](n); rnd.nextBytes(a); a
        case 1 => Array.tabulate[Byte](n)(i => "abc \n"(rnd.nextInt(5)).toByte)
        case 2 => Array.tabulate[Byte](n)(i => "aaaaaaaabbbbccde"(rnd.nextInt(16)).toByte)
        case _ => val s = new StringBuilder
          while (s.length < n) s.append("word" + rnd.nextInt(30) + " ")
          s.toString.take(n).getBytes("UTF-8")
      }
      check(s"fuzz$t", content, 1 + rnd.nextInt(1023))
    }
    // damage slice behavior
    var dmgOk = true
    for (id <- 0L until 200L) {
      val txt = "line one\nline two word word word\n" * (1 + (id % 20)).toInt
      val got = ZstdCodec.decode(ZstdSim.payloadFor(id, txt))
      val want = if (id % 7 == 0 || id % 7 == 3 || id % 7 == 5) got.isEmpty
                 else got.exists(c => new String(c, "UTF-8") == txt)
      if (!want) { println(s"FAIL damage id=$id: ${got.isDefined}"); dmgOk = false }
    }
    // single-bit-flip property on clean single-segment frames
    var flips = 0; var flipFails = 0
    for (t <- 0 until 30) {
      val txt = ("doc " + t + " body lorem ipsum dolor sit amet ") * (5 + t)
      val content = txt.getBytes("UTF-8")
      val clean = ZstdCodec.encodeFrame(content, 600 + t * 13 % 400)
      var benign = 0
      for (bit <- 0 until clean.length * 8) { // EVERY bit
        val d = clean.clone()
        d(bit / 8) = (d(bit / 8) ^ (1 << (bit % 8))).toByte
        flips += 1
        ZstdCodec.decode(d) match {
          case Some(got) if !java.util.Arrays.equals(got, content) =>
            flipFails += 1
            println(s"FAIL bitflip t=$t bit=$bit: SILENT WRONG DECODE")
          case Some(_) => benign += 1 // same content: FSE init-state slack
          case None => ()
        }
      }
      if (benign > 0) println(s"  t=$t: $benign benign flips (identical content)")
    }
    println(s"smoke done (damage=$dmgOk, bitflips tried=$flips silent=$flipFails)")
    // throughput micro-check
    val ptext = "the quick brown fox jumps over the lazy dog and says hello world to everyone here today\n" * 30
    val pbytes = ptext.getBytes("UTF-8")
    var sink = 0L
    for (i <- 0 until 3000)
      sink += ZstdCodec.decode(ZstdSim.payloadFor(1L, ptext)).map(_.length).getOrElse(0)
    val t0 = System.nanoTime()
    val n = 20000
    for (i <- 0 until n) {
      val e = ZstdCodec.encodeFrame(pbytes, 600 + i % 400)
      sink += ZstdCodec.decode(e).map(_.length).getOrElse(0)
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"perf: enc+dec $n x ${pbytes.length} B in $dt%.2f s = ${n / dt}%.0f docs/s single-thread, ${n * pbytes.length / dt / 1e6}%.1f MB/s (sink=$sink)")
  }
}
