package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** d148: safetensors — the framing, the reference validation rules,
  * and the damage classes. */
class SafeTensorsSpec extends AnyFunSuite {

  test("roundtrip: tensors decode name/shape/value-identical") {
    for (docId <- Seq(1L, 2L, 4L, 6L, 8L, 9L, 11L, 13L)) {
      val (tensors, buffer) = SafeTensors.decode(SafeTensorsSim.payloadFor(docId))
        .getOrElse(fail(s"doc $docId quarantined"))
      assert(tensors.size == SafeTensorsSim.kTensors(docId))
      tensors.sortBy(_.name).zipWithIndex.foreach { case (t, ti) =>
        assert(t.name == s"emb_$ti" && t.dtype == "F32")
        val rows = SafeTensorsSim.rowsOf(docId, ti)
        assert(t.shape == Seq(rows.toLong, 8L))
        val vs = SafeTensors.f32(t, buffer)
        (0 until rows).foreach { r =>
          (0 until 8).foreach { c =>
            assert(vs(r * 8 + c) == SafeTensorsSim.value(docId, ti, r, c))
          }
        }
      }
    }
  }

  test("damage classes: truncation, the lying shape, the overlapping offsets") {
    for (docId <- Seq(0L, 7L, 14L, 3L, 10L, 17L, 5L, 12L, 19L))
      assert(SafeTensors.decode(SafeTensorsSim.payloadFor(docId)).isEmpty,
        s"doc $docId should quarantine")
  }

  test("validation rules: gaps, bad dtypes, negative shapes, metadata grammar") {
    def file(json: String, buf: Array[Byte]): Array[Byte] = {
      val jb = json.getBytes("UTF-8")
      val out = new java.io.ByteArrayOutputStream
      var k = 0
      while (k < 8) {
        out.write(((jb.length.toLong >> (8 * k)) & 0xff).toInt); k += 1
      }
      out.write(jb); out.write(buf)
      out.toByteArray
    }
    val buf8 = new Array[Byte](8)
    assert(SafeTensors.decode(file(
      """{"a":{"dtype":"F32","shape":[2],"data_offsets":[0,8]}}""",
      buf8)).isDefined)
    // __metadata__ accepted as a string map
    assert(SafeTensors.decode(file(
      """{"__metadata__":{"format":"pt"},"a":{"dtype":"F32","shape":[2],"data_offsets":[0,8]}}""",
      buf8)).isDefined)
    for (bad <- Seq(
      // a GAP before the first tensor
      """{"a":{"dtype":"F32","shape":[1],"data_offsets":[4,8]}}""",
      // span disagrees with shape x dtype
      """{"a":{"dtype":"F32","shape":[3],"data_offsets":[0,8]}}""",
      // unknown dtype: never guessed
      """{"a":{"dtype":"F4","shape":[2],"data_offsets":[0,8]}}""",
      // negative dim
      """{"a":{"dtype":"F32","shape":[-2],"data_offsets":[0,8]}}""",
      // buffer not fully covered
      """{"a":{"dtype":"F32","shape":[1],"data_offsets":[0,4]}}""",
      // offsets past the buffer
      """{"a":{"dtype":"F32","shape":[4],"data_offsets":[0,16]}}""",
      // non-string metadata
      """{"__metadata__":{"n":1},"a":{"dtype":"F32","shape":[2],"data_offsets":[0,8]}}"""))
      assert(SafeTensors.decode(file(bad, buf8)).isEmpty, bad)
    // duplicate tensor names die in the JSON grammar itself
    assert(SafeTensors.decode(file(
      """{"a":{"dtype":"F32","shape":[1],"data_offsets":[0,4]},"a":{"dtype":"F32","shape":[1],"data_offsets":[4,8]}}""",
      buf8)).isEmpty)
    // every truncation quarantines
    val good = SafeTensorsSim.payloadFor(1L)
    (0 until good.length).foreach { cut =>
      assert(SafeTensors.decode(java.util.Arrays.copyOf(good, cut)).isEmpty)
    }
  }
}
