package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** PqAssignAllExpr (the fused PQ encoder) vs the composed per-subspace
  * form it replaced: `argmax_j dot(v_s, c_j) − |c_j|²/2` with
  * left-to-right float dots and first-max tie break. The reference is
  * a Scala loop with EXACTLY that float order, so any summation or
  * tie drift in the native expression fails the property. */
object PqAssignPropertySpec extends Properties("PqAssign") {

  private def reference(v: Array[Double],
                        books: Array[Array[Array[Double]]]): Seq[Int] = {
    val m = books.length
    val sub = books(0)(0).length
    (0 until m).map { s =>
      val scores = books(s).map { c =>
        var acc = 0.0
        var d = 0
        while (d < sub) { acc += v(s * sub + d) * c(d); d += 1 }
        acc - c.map(x => x * x).sum / 2.0
      }
      scores.indexOf(scores.max) // first max = array_position(array_max)
    }
  }

  private def flatten(books: Array[Array[Array[Double]]]): (Array[Double], Array[Double]) = {
    val m = books.length; val codes = books(0).length; val sub = books(0)(0).length
    val flat = new Array[Double](m * codes * sub)
    val halves = new Array[Double](m * codes)
    for (s <- 0 until m; j <- 0 until codes) {
      halves(s * codes + j) = books(s)(j).map(x => x * x).sum / 2.0
      System.arraycopy(books(s)(j), 0, flat, (s * codes + j) * sub, sub)
    }
    (flat, halves)
  }

  private val caseGen = for {
    m <- Gen.choose(1, 4)
    sub <- Gen.choose(1, 8)
    codes <- Gen.choose(1, 9)
    v <- Gen.listOfN(m * sub, Gen.choose(-4.0, 4.0))
    books <- Gen.listOfN(m, Gen.listOfN(codes,
      Gen.listOfN(sub, Gen.choose(-4.0, 4.0))))
  } yield (v.toArray, books.map(_.map(_.toArray).toArray).toArray)

  property("fused == composed argmax for arbitrary books and vectors") =
    Prop.forAll(caseGen) { case (v, books) =>
      val m = books.length; val codes = books(0).length
      val sub = books(0)(0).length
      val (flat, halves) = flatten(books)
      val got = graft.functions.PqAssignUtil.assign(
        new GenericArrayData(v), flat, halves, m, codes, sub)
      got != null && got.toIntArray().toSeq == reference(v, books)
    }

  property("duplicate codebook entries tie to the lowest code") =
    Prop.forAll(Gen.choose(1, 6)) { n =>
      // n identical best entries ahead of a worse one
      val books = Array(Array.fill(n)(Array(1.0, 0.0)) :+ Array(0.0, -9.0))
      val (flat, halves) = flatten(books)
      val got = graft.functions.PqAssignUtil.assign(
        new GenericArrayData(Array(1.0, 0.0)), flat, halves, 1, n + 1, 2)
      got.toIntArray().toSeq == Seq(0)
    }
}

/** Column-level integration: the expression evaluates inside a plan
  * (codegen path) and degrades to NULL on malformed input. */
class PqAssignSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("fused assignment runs in-plan and matches the in-JVM util") {
    import spark.implicits._
    val books = Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.5)),
      Array(Array(2.0, 2.0), Array(-2.0, 0.0), Array(0.25, 0.5)))
    val vs = Seq(Seq(0.5, -0.25, 1.5, 2.0), Seq(-3.0, 0.0, 0.0, 0.1))
    val got = vs.toDF("v")
      .select(graft.functions.PqAssignAllExpr.column(col("v"), books).as("cs"))
      .collect().map(_.getSeq[Int](0))
    val m = books.length; val codes = books(0).length; val sub = 2
    val flat = new Array[Double](m * codes * sub)
    val halves = new Array[Double](m * codes)
    for (s <- 0 until m; j <- 0 until codes) {
      halves(s * codes + j) = books(s)(j).map(x => x * x).sum / 2.0
      System.arraycopy(books(s)(j), 0, flat, (s * codes + j) * sub, sub)
    }
    vs.zip(got).foreach { case (v, g) =>
      val want = graft.functions.PqAssignUtil.assign(
        new GenericArrayData(v.toArray), flat, halves, m, codes, sub)
      assert(g == want.toIntArray().toSeq)
    }
  }

  test("dim mismatch and null vectors produce NULL, not garbage") {
    import spark.implicits._
    val books = Array(Array(Array(1.0, 0.0)))
    val df = Seq(Tuple1(Seq(1.0, 0.0, 3.0))).toDF("v") // dim 3 ≠ 2
    assert(df.select(graft.functions.PqAssignAllExpr.column(col("v"), books))
      .head.isNullAt(0))
    val dfn = Seq(Tuple1(null: Seq[Double])).toDF("v")
    assert(dfn.select(graft.functions.PqAssignAllExpr.column(col("v"), books))
      .head.isNullAt(0))
  }
}
