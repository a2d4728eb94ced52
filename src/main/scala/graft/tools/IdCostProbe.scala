package graft.tools

/** Dev probe: is per-doc sim cost id-dependent? (chasing the r14
  * rehearsal super-linearity on d134/d142). */
object IdCostProbe {
  def main(args: Array[String]): Unit = {
    val text = "the quick brown fox jumps over the lazy dog " * 20
    def timeIds(label: String, ids: Seq[Long], f: (Long, String) => Unit): Unit = {
      val t0 = System.nanoTime
      ids.foreach(id => f(id, text))
      println(f"$label%-28s ${(System.nanoTime - t0) / 1e9}%8.3f s (${ids.size} docs)")
    }
    val low = 1L to 2000L
    val high = 45001L to 47000L
    val vhigh = 4500001L to 4502000L
    def gp(id: Long, t: String): Unit = {
      val w = graft.operators.GitPackSim.writtenFor(id, t)
      graft.operators.GitPack.read(w.pack, w.idx)
      ()
    }
    def xz(id: Long, t: String): Unit = {
      graft.operators.XzJsonlSim.payloadFor(id, t)
      ()
    }
    timeIds("warmup gitpack", low.take(500), gp)
    timeIds("gitpack low ids", low, gp)
    timeIds("gitpack high ids", high, gp)
    timeIds("gitpack very high ids", vhigh, gp)
    timeIds("warmup xz", low.take(500), xz)
    timeIds("xz low ids", low, xz)
    timeIds("xz high ids", high, xz)
    timeIds("xz very high ids", vhigh, xz)
  }
}
