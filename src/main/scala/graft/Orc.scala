package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers for oracle-checked queries (SURVEY.md §5.3).
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * `oracleSql` text, after sorting columns by name. Two rules keep that
  * hash stable and are enforced here mechanically:
  *   - every DoubleType aggregate is rounded to 4 decimals on BOTH sides
  *     (double addition order differs between engines);
  *   - every oracle-checked query ends with a total-order ORDER BY present
  *     identically in the SQL.
  */
object Orc {
  /** Round a double expression to 4 decimals — pair with `round(x, 4)`
    * in the oracle SQL. */
  def r4(c: Column): Column = round(c, 4)

  /** Epoch seconds of a timestamp — timestamps cross engines more safely
    * as BIGINT (pair with `epoch(ts)::BIGINT` in DuckDB). */
  def epochS(c: Column): Column = unix_timestamp(c)
}
