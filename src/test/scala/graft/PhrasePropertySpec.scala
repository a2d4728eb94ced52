package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.PhraseAutomaton

/** Property-based check: for ARBITRARY phrase lists and texts over a
  * deliberately tiny alphabet (maximizing overlaps, shared prefixes,
  * and fail-transition traffic), the Aho–Corasick automaton's counts
  * equal a brute-force position scan. A hand-picked example suite
  * (PhraseMatchSpec) can miss automaton corner states; hundreds of
  * random instances over {a,b,c} cannot. Pure JVM — no Spark jobs. */
object PhrasePropertySpec extends Properties("PhraseAutomaton") {

  private val alpha = Gen.oneOf('a', 'b', 'c')
  private val phraseGen = Gen.choose(1, 4)
    .flatMap(n => Gen.listOfN(n, alpha).map(_.mkString))
  private val phrasesGen = Gen.choose(1, 6)
    .flatMap(n => Gen.listOfN(n, phraseGen).map(_.distinct))
    .suchThat(_.nonEmpty)
  private val textGen = Gen.choose(0, 60)
    .flatMap(n => Gen.listOfN(n, Gen.frequency(5 -> alpha, 1 -> Gen.const(' ')))
      .map(_.mkString))

  private def naiveCount(text: String, p: String): Long =
    (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong

  property("counts == brute-force position scan") =
    Prop.forAll(phrasesGen, textGen) { (phrases, text) =>
      val got = new PhraseAutomaton(phrases)
        .phraseCounts(UTF8String.fromString(text)).toLongArray.toSeq
      val want = phrases.map(naiveCount(text, _))
      got == want
    }

  property("counts are invariant to phrase-list order (aligned by phrase)") =
    Prop.forAll(phrasesGen, textGen) { (phrases, text) =>
      val a = new PhraseAutomaton(phrases)
        .phraseCounts(UTF8String.fromString(text)).toLongArray.toSeq
      val rev = phrases.reverse
      val b = new PhraseAutomaton(rev)
        .phraseCounts(UTF8String.fromString(text)).toLongArray.toSeq
      phrases.zip(a).toMap == rev.zip(b).toMap
    }
}
