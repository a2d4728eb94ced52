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
}
