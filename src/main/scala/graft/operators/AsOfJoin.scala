package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left ("probe") row, the latest right ("event")
  * row at or before the probe's timestamp, per key — the
  * point-in-time-correct lookup feature stores and ledgers run
  * (DuckDB spells it ASOF JOIN; q15's oracle uses exactly that).
  *
  * Scale shape: NOT a range join and not a per-probe scan — union both
  * sides, one window per key ordered by (ts, side), and backward-fill
  * the event payload with `last(_, ignoreNulls)`. Cost is ONE shuffle
  * on the key plus a per-key sort; at equal timestamps the event sorts
  * before the probe, so `ts == probe_ts` events are visible (>= / ASOF
  * semantics). Keys are many (users, instruments), so the window has
  * no single-reducer wall.
  */
object AsOfJoin {

  /** Backward as-of join.
    *
    * @param left     probe side; all its columns pass through
    * @param right    event side
    * @param keys     equi-key column names shared by both sides
    * @param tsCol    timestamp column name shared by both sides
    * @param payloads right-side columns to backward-fill onto probes
    *                 (null when the key has no event at or before the
    *                 probe time — left-join semantics)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payloads: Seq[String]): DataFrame = {
    require(payloads.nonEmpty, "as-of join needs at least one payload column")
    val leftOnly = left.columns.toSeq
      .filterNot(c => keys.contains(c) || c == tsCol)
    // align schemas: probes carry null payloads, events carry null
    // left-only columns, then one unionByName
    val probes = payloads.foldLeft(left.withColumn("_is_probe", lit(1))) {
      (d, p) => d.withColumn(p, lit(null).cast(right.schema(p).dataType))
    }
    val events0 = right.select((keys ++ Seq(tsCol) ++ payloads).map(col): _*)
    val events = leftOnly.foldLeft(events0.withColumn("_is_probe", lit(0))) {
      (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("_is_probe"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payloads.foldLeft(probes.unionByName(events)) { (d, p) =>
      d.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("_is_probe") === 1).drop("_is_probe")
  }
}
