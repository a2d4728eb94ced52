package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._
import graft.operators.TfEventsCodec._

/** d152: tfevents — the version handshake, the schema-exact Event
  * walk, the monotonicity rule, and the damage classes. */
class TfEventsSpec extends AnyFunSuite {

  test("roundtrip: training logs decode event-identical") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val want = TfEventsSim.eventsFor(docId)
      val got = decode(TfEventsSim.payloadFor(docId))
        .getOrElse(fail(s"doc $docId quarantined"))
      assert(got == want)
    }
  }

  test("damage classes: truncation, the wrong file_version, the swapped epochs") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L))
      assert(decode(TfEventsSim.payloadFor(docId)).isEmpty,
        s"doc $docId should quarantine")
  }

  test("schema strictness: unknown fields, duplicate tags, non-scalar members refuse") {
    val good = TfEventsCodec.encode(Seq(
      Event(1.0, 10, Seq(Scalar("a", 0.5f)))))
    assert(decode(good).isDefined)
    // an empty shard (no version record) refuses
    assert(decode(TfRecordCodec.encode(Seq.empty)).isEmpty)
    // a lone version record is a valid (empty) log
    assert(decode(TfEventsCodec.encode(Seq.empty)).contains(Seq.empty))
    // duplicate tags inside one summary
    val dup = TfEventsCodec.encode(Seq(
      Event(1.0, 10, Seq(Scalar("a", 0.5f), Scalar("a", 0.6f)))))
    assert(decode(dup).isEmpty)
    // flipping any payload byte trips the TFRecord crc layer below
    (0 until good.length by 3).foreach { i =>
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x20).toByte
      assert(decode(bad).isEmpty, s"flip at $i survived")
    }
  }
}
