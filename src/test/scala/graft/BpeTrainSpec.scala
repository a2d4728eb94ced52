package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** BPE merge learning: hand-computed merge sequences, the
  * leftmost-non-overlapping merge rule, frequency weighting, argmax
  * tie-breaking, and early stop when nothing is left to merge. */
class BpeTrainSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def train(rounds: Int, texts: String*): Seq[(Long, String, String, String, Long)] =
    TextOps.bpeTrain(texts.toDF("text"), col("text"), rounds)
      .as[(Long, String, String, String, Long)].collect().toSeq.sortBy(_._1)

  test("hand-computed merge sequence with frequency weighting") {
    // "ab" ×3 + "abc" ×1: pair (a,b) count 4 wins round 1; round 2
    // merges (ab,c) count 1 — the round-1 product participates
    val m = train(2, "ab ab ab abc")
    assert(m.map(t => (t._2, t._3, t._5)) == Seq(("a", "b", 4L), ("ab", "c", 1L)))
    assert(m(1)._4 == "abc")
  }

  test("leftmost non-overlapping: [a,a,a] under (a,a) gives [aa,a], so round 2 merges (aa,a)") {
    // "aaa": round 1 pair (a,a) appears twice in the word but counts
    // per occurrence position; after merging leftmost-first the word
    // is [aa, a], so round 2's top pair is (aa, a) — if the fold
    // merged right-first or re-merged the fresh symbol, round 2
    // would see (a, aa) instead
    val m = train(2, "aaa")
    assert(m(0)._2 == "a" && m(0)._3 == "a")
    assert((m(1)._2, m(1)._3) == ("aa", "a"))
  }

  test("argmax ties break on pair string ascending") {
    // "xy" and "yz" both count 2 → ("x y" < "y z") so (x,y) wins
    val m = train(1, "xy xy yz yz")
    assert((m(0)._2, m(0)._3) == ("x", "y"))
  }

  test("bpeEncode applies learned merges in order with the trainer's fold") {
    // hand merges: (a,b) then (ab,c) — order matters
    val m = Seq(("a", "b"), ("ab", "c"))
    val got = Seq("abc abd ba cab")
      .toDF("text").select(TextOps.bpeEncode(col("text"), m).as("p"))
      .as[Seq[String]].collect().head
    assert(got == Seq("abc", "ab", "d", "b", "a", "c", "ab"))
  }

  test("encode(train corpus) reproduces the trainer's symbol state") {
    val texts = Seq("low lower lowest low low slow")
    val df = texts.toDF("text")
    val learned = TextOps.bpeTrain(df, col("text"), rounds = 3)
      .orderBy("merge_round")
      .as[(Long, String, String, String, Long)].collect()
      .map(t => (t._2, t._3)).toSeq
    assert(learned.size == 3)
    val pieces = df.select(TextOps.bpeEncode(col("text"), learned).as("p"))
      .as[Seq[String]].collect().head
    // roundtrip: pieces concatenate back to the whitespace-free text
    assert(pieces.mkString("") == texts.head.replaceAll("\\s+", ""))
    // the LAST learned merge's product survives as a final piece (an
    // earlier product can be legitimately consumed by later merges —
    // "lo" disappears into "low")
    val mergedLast = learned.last._1 + learned.last._2
    assert(pieces.contains(mergedLast),
      s"expected piece $mergedLast in ${pieces.mkString(",")}")
  }

  test("early stop: single-char words leave nothing to merge") {
    assert(train(3, "a b c a b").isEmpty)
    // one mergeable word: learns its pairs then stops at full fusion
    val m = train(10, "ab a b")
    assert(m.size == 1 && m(0)._4 == "ab")
  }
}
