package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Mergeable Bloom filter over 64-bit hashes — the incremental-dedup
  * scale primitive.
  *
  * Why: deduping a new batch against a HISTORICAL corpus with an exact
  * anti-join re-shuffles the historical side (the 100 TB side) on every
  * run. A Bloom filter built over the historical content hashes is ONE
  * map-side-combinable aggregate (each executor sketches its partitions
  * independently; partials OR together losslessly — same mergeability
  * argument as HLL in [[graft.operators.Sketches]]), and the resulting
  * few-MB filter broadcasts so the new batch probes it map-only. No
  * false negatives, so the only follow-up shuffle is the exact
  * verification join on the tiny bloom-positive subset.
  *
  * Backed by Spark's own `org.apache.spark.util.sketch.BloomFilter`
  * (the runtime-filter sketch), fed pre-hashed longs (`xxhash64`) so
  * the aggregate stays type-agnostic and codegen stays on the built-in
  * hash. Registered for SQL as `bloom_agg(hash, n_items, fpp)`.
  */
case class BloomFilterAgg(
    child: Expression, nItemsExpr: Expression, fppExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType, DoubleType)

  override def checkInputDataTypes(): TypeCheckResult =
    super.checkInputDataTypes() match {
      case TypeCheckResult.TypeCheckSuccess
          if !nItemsExpr.foldable || !fppExpr.foldable =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires literal (foldable) n_items and fpp")
      case TypeCheckResult.TypeCheckSuccess =>
        (nItemsExpr.eval(InternalRow.empty), fppExpr.eval(InternalRow.empty)) match {
          case (null, _) | (_, null) =>
            TypeCheckResult.TypeCheckFailure(s"$prettyName requires non-null n_items and fpp")
          case (n: Long, _) if n <= 0 =>
            TypeCheckResult.TypeCheckFailure(s"$prettyName requires n_items > 0, got $n")
          case (_, f: Double) if f <= 0.0 || f >= 1.0 =>
            TypeCheckResult.TypeCheckFailure(s"$prettyName requires 0 < fpp < 1, got $f")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case other => other
    }

  private lazy val nItems: Long = nItemsExpr.eval(InternalRow.empty).asInstanceOf[Long]
  private lazy val fpp: Double = fppExpr.eval(InternalRow.empty).asInstanceOf[Double]

  override def createAggregationBuffer(): BloomFilter = BloomFilter.create(nItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter = {
    a.mergeInPlace(b)
    a
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, nItemsExpr, fppExpr)
  override def withNewMutableAggBufferOffset(o: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c(0), nItemsExpr = c(1), fppExpr = c(2))
  override def prettyName: String = "bloom_agg"
}

object BloomFilterAgg {
  /** `bloom_agg(hash64, nItems, fpp)` as a Column aggregate. */
  def column(hash64: Column, nItems: Column, fpp: Column): Column =
    graft.GraftFunctions.columnOf("bloom_agg",
      exprs => BloomFilterAgg(exprs(0), exprs(1), exprs(2)), hash64, nItems, fpp)
}

/** `bloom_contains(hash64, filterBytes)` — probe a serialized Bloom
  * filter. The filter argument must be foldable (a literal carrying the
  * collected/broadcast filter bytes): the filter deserializes ONCE per
  * task (codegen pins it as a reference object), so the probe itself is
  * a few word-indexed bit tests per row — scan speed, inside
  * whole-stage codegen. A non-foldable filter argument fails at
  * ANALYSIS time (would silently re-deserialize per row otherwise).
  */
case class BloomContainsExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint hash, got ${left.dataType.catalogString}")
    else if (right.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary filter bytes, got ${right.dataType.catalogString}")
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal (foldable) filter — collect the " +
          "bloom_agg result and pass it as a literal")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val filter: BloomFilter =
    right.eval(InternalRow.empty) match {
      case null => null
      case bytes: Array[Byte] => BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    }

  override def eval(input: InternalRow): Any = {
    if (filter == null) return null
    val v = left.eval(input)
    if (v == null) null else filter.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (filter == null) {
      val lit = org.apache.spark.sql.catalyst.expressions.Literal
        .create(null, BooleanType)
      return lit.genCode(ctx)
    }
    val bf = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (h, _) => s"${ev.value} = $bf.mightContainLong($h);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomContainsExpr {
  def column(hash64: Column, filterBytes: Column): Column =
    graft.GraftFunctions.columnOf("bloom_contains",
      exprs => BloomContainsExpr(exprs(0), exprs(1)), hash64, filterBytes)
}
