package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.operators.Components

/** Random-graph equivalence net for connected components: the
  * single-partition union-find fast path, the forced distributed
  * pointer-jump loop, and a plain in-JVM reference union-find must
  * agree on ARBITRARY graphs — self-loops, duplicate edges, both
  * orientations, isolates, and id gaps included. The two fixed-graph
  * pins (chain fixture, sf0.1 gate graph) cover the real shapes;
  * random graphs cover the corner cases they can't. */
class CcPropertySpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def reference(verts: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (c != r) { val n = parent.getOrElse(c, c); parent.update(c, r); c = n }
      r
    }
    edges.foreach { case (s, d) =>
      val rs = find(s); val rd = find(d)
      if (rs < rd) parent.update(rd, rs)
      else if (rd < rs) parent.update(rs, rd)
    }
    verts.map(v => v -> find(v)).toMap
  }

  private val graphGen = for {
    n <- Gen.choose(1, 24)
    // sparse ids with gaps — labels must be ids, not positions
    verts <- Gen.listOfN(n, Gen.choose(0L, 60L)).map(_.distinct)
    nE <- Gen.choose(0, 30)
    edges <- Gen.listOfN(nE, for {
      a <- Gen.oneOf(verts)
      b <- Gen.oneOf(verts)
    } yield (a, b)) // includes self-loops and duplicates by construction
  } yield (verts, edges)

  test("fast path == forced loop == reference union-find on random graphs") {
    import spark.implicits._
    val samples = Gen.listOfN(12, graphGen).sample.get
    samples.foreach { case (verts, edges) =>
      val vDf = verts.toDF("id")
      val eDf = edges.toDF("src", "dst")
      val want = reference(verts, edges)
      val fast = Components.connectedComponents(vDf, eDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == want, s"fast path diverged: verts=$verts edges=$edges")
      val loop = Components.connectedComponents(vDf, eDf,
        edgesPerPartition = 1L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(loop == want, s"loop diverged: verts=$verts edges=$edges")
    }
  }
}
