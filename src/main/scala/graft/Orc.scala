package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for oracle-checked queries (SURVEY.md §5.3).
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * `oracleSql` text, after sorting columns by name. Two rules keep that
  * hash stable and are enforced here mechanically:
  *   - every DoubleType aggregate is rounded to 4 decimals on BOTH sides
  *     via the SAME IEEE-754 op sequence (`floor(x*1e4 + 0.5)/1e4`) — see
  *     [[r4]] for Spark and [[round4Sql]] for the DuckDB text. Spark's
  *     `round(double, n)` goes through BigDecimal HALF_UP on the shortest
  *     decimal repr while DuckDB rounds the C double — those diverge at
  *     representation-boundary values (r02 VERDICT: `f4_math`). With an
  *     identical mul/add/floor/div sequence, both engines produce
  *     bit-identical doubles regardless of sign or rounding convention;
  *   - every oracle-checked query ends with a total-order ORDER BY present
  *     identically in the SQL.
  */
object Orc {
  /** Round a double expression to `scale` decimals with explicit IEEE
    * ops. Oracle SQL may keep writing `round(x, n)` — [[round4Sql]]
    * rewrites it to the identical op sequence mechanically at the
    * SparkEntry boundary, so the pairing cannot drift by convention. */
  def rN(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale) // exact in double for scale <= 15
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Round a double expression to 4 decimals — the house default for
    * oracle-checked double aggregates. */
  def r4(c: Column): Column = rN(c, 4)

  /** Epoch seconds of a timestamp — timestamps cross engines more safely
    * as BIGINT (pair with `epoch(ts)::BIGINT` in DuckDB). */
  def epochS(c: Column): Column = unix_timestamp(c)

  /** Mechanically rewrite every `round(E, n)` (literal integer scale n)
    * in a DuckDB oracle SQL text to `floor((E) * 1en + 0.5) / 1en` — the
    * exact op sequence [[rN]] emits on the Spark side. Paren-balanced, so
    * nested calls like `round(quantile_cont(x, 0.9), 4)` and window args
    * like `round(lag(x, 1) OVER w, 4)` rewrite correctly (only the
    * top-level trailing scale is matched). Applied to the whole oracle
    * map in [[SparkEntry.oracleSql]]. */
  def round4Sql(sql: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < sql.length) {
      if (sql.startsWith("round(", i) &&
          (i == 0 || !sql.charAt(i - 1).isLetterOrDigit && sql.charAt(i - 1) != '_')) {
        val open = i + "round".length
        var depth = 1
        var j = open + 1
        var lastTopComma = -1
        while (j < sql.length && depth > 0) {
          sql.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 1 => lastTopComma = j
            case _ =>
          }
          j += 1
        }
        val close = j - 1 // index of the matching ')'
        val scale = if (depth == 0 && lastTopComma >= 0)
          sql.substring(lastTopComma + 1, close).trim else ""
        if (scale.nonEmpty && scale.forall(_.isDigit)) {
          val arg = sql.substring(open + 1, lastTopComma).trim
          b.append(s"floor(($arg) * 1e$scale + 0.5) / 1e$scale")
          i = close + 1
        } else {
          b.append(sql.charAt(i)); i += 1
        }
      } else {
        b.append(sql.charAt(i)); i += 1
      }
    }
    b.toString
  }
}
