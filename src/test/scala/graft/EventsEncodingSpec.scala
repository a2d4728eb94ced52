package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The driver's events.parquet has shipped with `ts` as parquet
  * TIMESTAMP(NANOS) (rounds 1-4; scans as LongType under
  * `spark.sql.legacy.parquet.nanosAsLong`) and as TIMESTAMP(MICROS)
  * (round 5+; scans as a native timestamp). The r5 regression: the
  * unconditional nanos shim failed analysis on the micros encoding and
  * silently broke every events-table operator. Tables.load now
  * dispatches on the scanned dtype; this spec pins BOTH encodings to
  * identical results so the next testdata regeneration can't break it.
  *
  * Spark cannot write TIMESTAMP(NANOS) parquet itself, but under
  * nanosAsLong that encoding scans as a plain Long column — so writing
  * the same instants as raw nanos longs reproduces exactly what the
  * scan delivers to Tables.load on the legacy encoding.
  */
class EventsEncodingSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def writeBoth(): (String, String) = {
    import spark.implicits._
    val base = SparkTestSession.tmpDir("events-enc").toString
    val micros = Seq(
      (1L, 1750000000000000L, 10L, "click", 1.0, "{}"),
      (2L, 1750000060000000L, 10L, "view", 2.0, "{}"),
      (3L, 1750009000000000L, 11L, "click", 3.0, "{}"))
    // micros encoding: a real TimestampType column
    micros.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/micros/events.parquet")
    // nanos-long encoding: what TIMESTAMP(NANOS) scans as under nanosAsLong
    micros.map { case (id, us, u, t, v, p) => (id, us * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$base/nanos/events.parquet")
    (s"$base/micros", s"$base/nanos")
  }

  test("Tables.load yields identical TimestampType events for both encodings") {
    val (microsDir, nanosDir) = writeBoth()
    val a = Tables.load(spark, microsDir, "events")
    val b = Tables.load(spark, nanosDir, "events")
    assert(a.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(b.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val ra = a.orderBy("event_id").select("event_id", "ts").collect().toSeq
    val rb = b.orderBy("event_id").select("event_id", "ts").collect().toSeq
    assert(ra.map(_.toString) == rb.map(_.toString))
  }

  test("an events query (sessionize) runs green over both encodings") {
    val (microsDir, nanosDir) = writeBoth()
    val q = SparkEntry.queries("q12_sessionize")
    val ca = q(spark, microsDir).orderBy("user_id", "session_id").collect()
    val cb = q(spark, nanosDir).orderBy("user_id", "session_id").collect()
    assert(ca.nonEmpty)
    assert(ca.map(_.toString).toSeq == cb.map(_.toString).toSeq)
  }
}
