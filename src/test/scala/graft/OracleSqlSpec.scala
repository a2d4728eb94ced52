package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.OracleSql.fixRounds

/** fixRounds rewrites 2-arg round() into the engine-portable floor form
  * without touching identifiers that merely end in "round". */
class OracleSqlSpec extends AnyFunSuite {

  test("basic 2-arg rewrite") {
    assert(fixRounds("SELECT round(x, 2) FROM t") ==
      "SELECT floor((x) * 100.0 + 0.5) / 100.0 FROM t")
  }

  test("nested parens and commas inside the expr") {
    assert(fixRounds("round(coalesce(a, b), 1)") ==
      "floor((coalesce(a, b)) * 10.0 + 0.5) / 10.0")
  }

  test("identifiers ending in round are untouched") {
    val sql = "SELECT a_round(x, 2), workaround(y, 3) FROM t"
    assert(fixRounds(sql) == sql)
  }

  test("1-arg round passes through unchanged") {
    val sql = "SELECT round(x) FROM t"
    assert(fixRounds(sql) == sql)
  }

  test("2-arg round nested inside 1-arg round still rewritten") {
    assert(fixRounds("round(round(x, 2))") ==
      "round(floor((x) * 100.0 + 0.5) / 100.0)")
  }

  test("multiple occurrences all rewritten") {
    assert(fixRounds("round(a, 1) + round(b, 2)") ==
      "floor((a) * 10.0 + 0.5) / 10.0 + floor((b) * 100.0 + 0.5) / 100.0")
  }

  /** Queries without an oracle run under the driver's weaker rows-only
    * check — every such gap must be a DELIBERATE member of this list,
    * never an accidental omission. Empty since r6: the last rows-only
    * members (d02/d03/d04/d11, xxhash64-seeded) now carry in-plan
    * verdicts pinned to their oracle-proven polynomial twins
    * (d24/d27/d53/d23+d59) and hash-check like everything else. */
  val ROWS_ONLY_JUSTIFIED = Set.empty[String]

  test("every gate query has an oracle unless deliberately rows-only; no orphan oracles") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) == ROWS_ONLY_JUSTIFIED,
      s"undocumented rows-only queries: ${(q -- o) -- ROWS_ONLY_JUSTIFIED}; " +
        s"stale justifications: ${ROWS_ONLY_JUSTIFIED -- (q -- o)}")
    assert((o -- q).isEmpty, s"oracles without a query: ${o -- q}")
  }
}
