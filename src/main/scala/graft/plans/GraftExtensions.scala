package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Catalyst extension point: `--conf spark.sql.extensions=
  * graft.plans.GraftExtensions` (or `experimental.extraOptimizations`
  * on a live session) injects graft's optimizer rules.
  *
  * Currently: [[RangeJoinBinningRule]] — users can write the natural
  * `events.join(intervals, ts.between(start, end))` and still get the
  * binned hash-join plan of `RangeJoin.binned` instead of the
  * BroadcastNestedLoopJoin Spark would otherwise produce. This is the
  * (c)-tier custom-operator route from SURVEY §3: whole-operator
  * semantics injected as a `Rule[LogicalPlan]`, leaving physical
  * planning to the stock strategies (the rewritten join has an equi
  * key, so ExtractEquiJoinKeys picks a hash join).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule { session =>
      RangeJoinBinningRule(
        session.conf.get("spark.graft.rangeJoin.binSeconds", "21600").toLong)
    }
}

/** Rewrites an inner join whose ONLY condition is
  * `ts BETWEEN lo AND hi` (ts from the left side, lo/hi timestamps
  * from the right, no equi keys) into the time-binned form:
  *
  *   left + bin(ts)  ⋈_{bin equal ∧ range}  right + explode(bins(lo..hi))
  *
  * Each left row lands in exactly ONE bin, so no post-join dedup is
  * needed; the exact range predicate is kept, so results are identical
  * to the naive join at second resolution. The guard requires the
  * condition to be exactly the two range conjuncts — the rewritten
  * join (3 conjuncts, one an equality) can never re-match, so the rule
  * is idempotent under the fixed-point batch.
  *
  * Dirty-data semantics match the join it replaces: an inverted
  * interval (`hi < lo`) or null bound produces NO matches under
  * BETWEEN, so the right side is filtered to `bin(hi) >= bin(lo)`
  * before the explode — a bare `Sequence(lo, hi)` would otherwise
  * throw on reversed bounds at runtime, turning a no-match row into a
  * query failure.
  */
case class RangeJoinBinningRule(binS: Long) extends Rule[LogicalPlan] {

  // post-analysis rules must supply the timezone themselves — a
  // tz-aware Cast/Sequence with timeZoneId=None reads as unresolved
  // and fails plan validation
  private def tz: Option[String] = Some(conf.sessionLocalTimeZone)

  private def bin(e: Expression): Expression =
    IntegralDivide(Cast(e, LongType, tz), Literal(binS))

  private def isTs(e: Expression): Boolean = e.dataType == TimestampType

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner,
        Some(And(GreaterThanOrEqual(ts1, lo), LessThanOrEqual(ts2, hi))), hint)
      if ts1.semanticEquals(ts2) &&
        isTs(ts1) && isTs(lo) && isTs(hi) &&
        ts1.references.nonEmpty && lo.references.nonEmpty &&
        ts1.references.subsetOf(left.outputSet) &&
        (lo.references ++ hi.references).subsetOf(right.outputSet) =>
      val lBin = Alias(bin(ts1), "_graft_bin")()
      val newLeft = Project(left.output :+ lBin, left)
      val rBin = AttributeReference("_graft_bin_r", LongType, nullable = false)()
      // reversed/null bounds: BETWEEN yields no match; Sequence throws.
      // Filter (null predicate drops the row) preserves the semantics.
      val guarded = Filter(GreaterThanOrEqual(bin(hi), bin(lo)), right)
      val newRight = Generate(
        Explode(new Sequence(bin(lo), bin(hi), Some(Literal(1L)), tz)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(rBin), child = guarded)
      val cond = And(EqualTo(lBin.toAttribute, rBin), j.condition.get)
      Project(j.output, Join(newLeft, newRight, Inner, Some(cond), hint))
  }
}
