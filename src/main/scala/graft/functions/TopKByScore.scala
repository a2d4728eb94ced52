package graft.functions

import java.nio.ByteBuffer
import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score, id) pairs in a
  * size-k heap per group — ordering (score desc, id asc), exactly the
  * ANN ranking convention.
  *
  * Why a custom aggregate: the composed form (`row_number over
  * (partition by g order by score desc)` + `filter rank <= k`) sorts
  * EVERY candidate row per group; this keeps O(k) state and does one
  * pass — at 100 TB the difference between a full sort-shuffle of all
  * scored pairs and map-side-combined k-row partial aggregates.
  * Registered for SQL as `topk_by_score(score, id, k)`.
  */
case class TopKByScore(
    scoreExpr: Expression, idExpr: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with ImplicitCastInputTypes {

  // SQL callers get implicit casts (int score → double, int id → long)
  // instead of a runtime ClassCastException in update().
  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, LongType, IntegerType)

  override def checkInputDataTypes(): TypeCheckResult =
    super.checkInputDataTypes() match {
      case TypeCheckResult.TypeCheckSuccess if !kExpr.foldable =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal (foldable) k")
      case TypeCheckResult.TypeCheckSuccess =>
        // a NULL literal is foldable and passes the implicit cast —
        // reject it here instead of MatchError-ing in the lazy k
        kExpr.eval(InternalRow.empty) match {
          case null =>
            TypeCheckResult.TypeCheckFailure(s"$prettyName requires a non-null k")
          case i: Int if i <= 0 =>
            TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0, got $i")
          case l: Long if l <= 0 =>
            TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0, got $l")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case other => other
    }

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"k must be a non-null literal int, got $other")
  }

  // priority = "worstness": dequeue yields the entry to evict
  // (lowest score; ties: larger id is worse)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null) {
      buf.enqueue((s.asInstanceOf[Double], id.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
                     b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { e => a.enqueue(e); if (a.size > k) a.dequeue() }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, id) => (-s, id) }
    new GenericArrayData(sorted.map { case (s, id) => InternalRow(s, id) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, id) => bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = createAggregationBuffer()
    (0 until n).foreach(_ => q.enqueue((bb.getDouble, bb.getLong)))
    q
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = c(0), idExpr = c(1), kExpr = c(2))
  override def prettyName: String = "topk_by_score"
}

object TopKByScore {
  /** `topk_by_score(score, id, k)` as a Column aggregate —
    * session-independent (see GraftFunctions.columnOf). */
  def column(score: Column, id: Column, k: Column): Column =
    graft.GraftFunctions.columnOf("topk_by_score",
      exprs => TopKByScore(exprs(0), exprs(1), exprs(2)), score, id, k)
}
