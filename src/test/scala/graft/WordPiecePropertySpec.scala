package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.WordPieceVocab

/** Property-based check of the WordPiece greedy longest-match encoder
  * against an independent reference implementation, over random vocabs
  * and texts on a tiny alphabet (maximizing piece overlap and greedy
  * dead-ends). Complements WordPieceSpec's hand-picked cases the same
  * way PhrasePropertySpec backs PhraseMatchSpec. Pure JVM. */
object WordPiecePropertySpec extends Properties("WordPieceEncode") {

  private val alpha = Gen.oneOf('a', 'b')
  private val stemGen = Gen.choose(1, 3)
    .flatMap(n => Gen.listOfN(n, alpha).map(_.mkString))
  private val vocabGen = for {
    stems <- Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, stemGen))
    conts <- Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, stemGen))
    // always include the single letters as stems so SOME words encode
  } yield (("a" :: "b" :: stems) ++ conts.map("##" + _)).distinct
  private val textGen = Gen.choose(0, 30)
    .flatMap(n => Gen.listOfN(n,
      Gen.frequency(4 -> alpha, 1 -> Gen.const(' '))).map(_.mkString))

  /** Independent greedy reference: longest vocab piece at each cursor
    * (continuations need the ## form after the first piece); any
    * dead-end makes the whole word [UNK]. */
  private def refEncode(vocab: Seq[String], text: String): Seq[String] = {
    val stems = vocab.filterNot(_.startsWith("##")).toSet
    val conts = vocab.filter(_.startsWith("##")).map(_.drop(2)).toSet
    text.trim.split("\\s+").filter(_.nonEmpty).flatMap { w =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      var dead = false
      while (i < w.length && !dead) {
        val set = if (i == 0) stems else conts
        val lens = (w.length - i) to 1 by -1
        lens.find(l => set.contains(w.substring(i, i + l))) match {
          case Some(l) =>
            out += (if (i == 0) w.substring(i, i + l)
                    else "##" + w.substring(i, i + l))
            i += l
          case None => dead = true
        }
      }
      if (dead) Seq("[UNK]") else out.toSeq
    }.toSeq
  }

  property("matches an independent greedy reference") =
    Prop.forAll(vocabGen, textGen) { (vocab, text) =>
      val got = new WordPieceVocab(vocab)
        .encodeText(UTF8String.fromString(text))
      val gotSeq = (0 until got.numElements())
        .map(i => got.getUTF8String(i).toString)
      gotSeq == refEncode(vocab, text)
    }
}
