package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{UnigramEncodeExpr, UnigramModel}
import graft.operators.UnigramLm

/** Unigram-LM tokenizer (d99): model-level pins for the Viterbi
  * segmenter and trainer-level pins for the EM loop — the oracle
  * hash-checks the full trajectory; these specs pin the pieces the
  * hash can't explain when it breaks. */
class UnigramSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("ilog3 is exactly floor(3*log2(c)) across magnitudes") {
    // boundary-exact: 2^k cubes land exactly on bit boundaries where
    // a float log would be one ULP away
    for (c <- Seq(1L, 2L, 3L, 4L, 7L, 8L, 9L, 255L, 256L, 1000000L,
      (1L << 20) - 1, 1L << 20, 7000000L)) {
      val exact = UnigramModel.ilog3(c)
      val viaBits = BigInt(c).pow(3).bitLength - 1
      assert(exact == viaBits)
      if (c > 1) {
        // sanity against the float form away from boundaries
        val f = math.floor(3.0 * math.log(c.toDouble) / math.log(2.0)).toLong
        assert(math.abs(exact - f) <= 1, s"c=$c exact=$exact float=$f")
      }
    }
  }

  /** Brute force over ALL segmentations with the same objective and
    * tie-break — the Viterbi DP must pick the identical one. */
  private def bruteBest(w: String, m: Map[String, Long]): Seq[String] = {
    def all(s: String): Seq[Seq[String]] =
      if (s.isEmpty) Seq(Seq.empty)
      else (1 to math.min(4, s.length)).flatMap { l =>
        val p = s.substring(0, l)
        if (m.contains(p)) all(s.substring(l)).map(p +: _) else Seq.empty
      }
    val t = UnigramModel.ilog3(m.values.sum)
    def key(seg: Seq[String]): (Long, Int, Seq[Int]) =
      (seg.map(p => UnigramModel.ilog3(m(p)) - t).sum, seg.size,
        // last-piece-longest tie-break applies at every backtrack
        // level: compare piece lengths right-to-left, longer first
        seg.reverse.map(p => -p.length))
    implicit val ord: Ordering[(Long, Int, Seq[Int])] =
      Ordering.Tuple3(Ordering.Long.reverse, Ordering.Int,
        Ordering.Implicits.seqOrdering[Seq, Int])
    all(w).minBy(key)
  }

  test("viterbi == brute-force argmax on random small vocabularies") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    for (trial <- 1 to 300) {
      // random multi-char pieces over a tiny alphabet + all chars
      val multi = (1 to 2 + rnd.nextInt(6)).map { _ =>
        val len = 2 + rnd.nextInt(3)
        (1 to len).map(_ => alphabet(rnd.nextInt(4))).mkString
      }.distinct
      val pieces = (alphabet.map(_.toString) ++ multi).distinct
        .map(p => p -> (1L + rnd.nextInt(1000))).sortBy(_._1)
      val m = new UnigramModel(pieces)
      val w = (1 to 1 + rnd.nextInt(10))
        .map(_ => alphabet(rnd.nextInt(4))).mkString
      val got = m.segmentWord(w).toSeq
      val want = bruteBest(w, pieces.toMap)
      assert(got == want, s"trial $trial word=$w pieces=$pieces")
      assert(got.mkString == w, "pieces must reassemble the word")
    }
  }

  test("hand-computed segmentation, tie-breaks, and the unk path") {
    // counts chosen so 'ab' (8) and each char (1) give:
    //   score(ab) = ilog3(8) - ilog3(12) = 9 - 10 = -1
    //   score(a) = score(b) = ilog3(1) - ilog3(12) = 0 - 10 = -10
    // 'abab' as ab+ab = -2 beats any char-mixed split (≤ -21)
    val m = new UnigramModel(Seq("a" -> 1L, "b" -> 1L, "c" -> 2L, "ab" -> 8L))
    assert(m.segmentWord("abab").toSeq == Seq("ab", "ab"))
    assert(m.segmentWord("ab").toSeq == Seq("ab"))
    assert(m.segmentWord("ba").toSeq == Seq("b", "a"))
    // unseen character anywhere → the whole word is <unk>
    assert(m.segmentWord("axb").toSeq == Seq("<unk>"))
    assert(m.segmentWord("").toSeq == Seq.empty)
    // whitespace split in the expression path
    val sp = spark
    import sp.implicits._
    val got = Seq("ab ba  abab").toDF("t")
      .select(UnigramEncodeExpr.column(col("t"), m).as("p"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("ab", "b", "a", "ab", "ab"))
  }

  test("trainer: encode under round r-1's model reproduces round r's counts") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
    val traj = UnigramLm.train(docs, col("text"), rounds = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byRound = traj.groupBy(_._1).view
      .mapValues(_.map(x => x._2 -> x._3).toMap).toMap
    assert(byRound.keySet == Set(0L, 1L, 2L))
    // round-0 chars present, every round's pieces reassembled from
    // the previous round's model must give exactly the next counts
    for (r <- Seq(1L, 2L)) {
      val model = new UnigramModel(byRound(r - 1).toSeq.sortBy(_._1))
      val words = docs.select(explode(graft.operators.TextOps.tokens(col("text"))).as("w"))
        .filter(col("w") =!= "" && length(col("w")) <= 12)
        .groupBy("w").agg(count(lit(1)).as("f"))
        .collect().map(x => x.getString(0) -> x.getLong(1))
      val recount = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      words.foreach { case (w, f) =>
        model.segmentWord(w).foreach(p => recount(p) += f) }
      val expected = byRound(r - 1).keySet.flatMap { p =>
        val c = recount(p)
        if (p.length == 1) Some(p -> math.max(c, 1L))
        else if (c > 0) Some(p -> c) else None
      }.toMap
      assert(byRound(r) == expected, s"round $r")
    }
    // retention: multi-char pieces only ever lose members, chars never
    assert(byRound(1L).keySet.subsetOf(byRound(0L).keySet))
    assert(byRound(2L).keySet.subsetOf(byRound(1L).keySet))
    val chars0 = byRound(0L).keySet.filter(_.length == 1)
    assert(chars0.subsetOf(byRound(2L).keySet))
  }
}
