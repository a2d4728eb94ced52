package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable decimal rounding.
  *
  * Spark's `round` applies HALF_UP to the shortest decimal rendering of
  * the double (BigDecimal.valueOf), DuckDB rounds the binary value —
  * they disagree on exact `.xx5` points, which ratio-of-integer values
  * hit constantly. `rd` computes `floor(x·10ⁿ + 0.5)/10ⁿ` in pure double
  * arithmetic; [[OracleSql.fixRounds]] rewrites `round(x, n)` in oracle
  * SQL to the same formula, so both engines execute identical IEEE ops.
  */
object Round {
  def rd(c: Column, digits: Int): Column = {
    val m = math.pow(10, digits)
    floor(c * m + 0.5) / m
  }
}

object OracleSql {
  /** Rewrite every `round(EXPR, N)` in a SQL string to
    * `floor((EXPR) * 10^N + 0.5) / 10^N` (balanced-paren aware). */
  def fixRounds(sql: String): String = {
    val key = "round("
    val idx = sql.toLowerCase.indexOf(key)
    if (idx < 0) return sql
    var depth = 1
    var i = idx + key.length
    var lastComma = -1
    while (depth > 0 && i < sql.length) {
      sql(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 1 => lastComma = i
        case _ =>
      }
      i += 1
    }
    val close = i - 1
    require(lastComma > 0, s"round() without digits in: $sql")
    val inner = sql.substring(idx + key.length, lastComma).trim
    val digits = sql.substring(lastComma + 1, close).trim.toInt
    val m = math.pow(10, digits)
    val repl = s"floor(($inner) * $m + 0.5) / $m"
    fixRounds(sql.substring(0, idx) + repl + sql.substring(close + 1))
  }
}
