package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values / bottom-k) distinct sketch over hashes —
  * the mergeable set-cardinality-AND-intersection primitive.
  *
  * Why: estimating |A ∩ B| across two 100 TB corpora with an exact
  * join shuffles both sides; HLL ([[graft.operators.Sketches]]) gives
  * |A| and |A ∪ B| but unions only — intersection via
  * inclusion–exclusion amplifies error catastrophically for small
  * overlaps. A KMV sketch keeps the k smallest DISTINCT hash values:
  * state is ≤ k longs per partition, partials merge losslessly
  * (union, re-trim to k), the result is a few KB that broadcasts —
  * and because the retained values are the actual minima (not
  * projections), two sketches support direct Jaccard/intersection
  * estimation: J ≈ |S_U ∩ S_A ∩ S_B| / k over the union sketch S_U,
  * with θ = m/M from its k-th minimum m (Beyer et al., "On synopses
  * for distinct-value estimation under multiset operations").
  *
  * The aggregate is hash-agnostic (fed pre-computed longs). Fed the
  * oracle-replayable polynomial fingerprint, every retained value —
  * and therefore the whole estimate — is exact integer arithmetic
  * both engines agree on (the d112 gate). Registered for SQL as
  * `kmv_agg(hash, k)`; returns the sorted ascending array of ≤ k
  * distinct minima.
  */
case class KmvSketchAgg(
    child: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]]
  with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)

  override def checkInputDataTypes(): TypeCheckResult =
    super.checkInputDataTypes() match {
      case TypeCheckResult.TypeCheckSuccess if !kExpr.foldable =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal k")
      case TypeCheckResult.TypeCheckSuccess =>
        kExpr.eval(InternalRow.empty) match {
          case null => TypeCheckResult.TypeCheckFailure(s"$prettyName requires non-null k")
          case n: Int if n <= 0 || n > (1 << 20) =>
            TypeCheckResult.TypeCheckFailure(s"$prettyName requires 0 < k <= 2^20, got $n")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case other => other
    }

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // only admit values that can enter the bottom-k (cheap gate:
      // most rows of a big corpus fail it without mutating the set)
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { if (buf.add(h)) buf.pollLast() }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[Long], b: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    // exact lossless merge: union, trim back to the k minima (b holds
    // ≤ k values, so this is O(k log k) per partial)
    a.addAll(b)
    while (a.size > k) a.pollLast()
    a
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0), kExpr = c(1))
  override def prettyName: String = "kmv_agg"
}

object KmvSketchAgg {
  /** `kmv_agg(hash64, k)` as a Column aggregate. */
  def column(hash64: Column, k: Column): Column =
    graft.GraftFunctions.columnOf("kmv_agg",
      exprs => KmvSketchAgg(exprs(0), exprs(1)), hash64, k)
}
