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

/** Exact integer floor division for non-negative longs — THE shared
  * helper for every oracle-exact integer-arithmetic path (classifier
  * weights/scores, streaming twins). The naive
  * `((a - pmod(a, b)) / b).cast("long")` routes two longs through
  * Spark's double `Divide`: above 2⁵³ the numerator loses ulps and the
  * truncating cast can land at q−1 — silently breaking the documented
  * bit-identical-to-DuckDB (`//`) contract exactly at the corpus sizes
  * the operators advertise. Here the subtraction makes the numerator
  * an EXACT multiple of b in DECIMAL(38,0), so the decimal division's
  * scale-6 rounding hits the integer quotient exactly and the final
  * cast is lossless for any |q| < 2⁶³. */
object IntMath {
  def intDiv(a: Column, b: Column): Column = {
    val ad = a.cast("decimal(38,0)")
    val bd = b.cast("decimal(38,0)")
    ((ad - pmod(ad, bd)) / bd).cast("long")
  }
}

object OracleSql {
  // word boundary before "round(": don't corrupt a_round(...) / xround(...)
  private val RoundCall = "(?i)(?<![a-zA-Z0-9_])round\\(".r

  /** Rewrite every 2-arg `round(EXPR, N)` in a SQL string to
    * `floor((EXPR) * 10^N + 0.5) / 10^N` (balanced-paren aware).
    * 1-arg `round(x)` rounds to an integer identically in both engines
    * on the values we emit, so it passes through unchanged. */
  def fixRounds(sql: String): String = {
    val m0 = RoundCall.findFirstMatchIn(sql).getOrElse(return sql)
    val idx = m0.start
    var depth = 1
    var i = m0.end
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
    if (lastComma < 0)
      // 1-arg round: keep it, continue scanning inside its args + beyond
      return sql.substring(0, m0.end) + fixRounds(sql.substring(m0.end))
    val inner = sql.substring(m0.end, lastComma).trim
    val digits = sql.substring(lastComma + 1, close).trim.toInt
    val m = math.pow(10, digits)
    val repl = s"floor(($inner) * $m + 0.5) / $m"
    fixRounds(sql.substring(0, idx) + repl + sql.substring(close + 1))
  }
}
