package graft

/** Every registered query key must at least pass ANALYSIS on the test
  * data — a query that throws at analysis time produces NO row in the
  * driver's correctness file (it is dropped, not marked `err`), so the
  * file can look all-green while operators are broken (exactly how the
  * r5 events.ts schema drift hid 7 broken operators). This spec turns
  * that silent-drop failure class into a red test: `.schema` forces
  * analysis (no execution), so the whole sweep stays cheap.
  */
class EntryAnalysisSpec extends org.scalatest.funsuite.AnyFunSuite {

  lazy val spark = SparkTestSession.get
  val sfDir = "/root/testdata/sf0.001"

  test("every SparkEntry.queries key analyzes on sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        try { q(spark, sfDir).schema; None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty, s"queries failing analysis:\n${failures.mkString("\n")}")
  }

  test("every oracleSql key has a queries entry (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys with no query: $orphans")
  }
}
