package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Round-10 surface batch 57: modern SQL front-door surface — GROUP BY
  * ALL (the infer-the-grouping-keys shorthand both engines now parse),
  * LATERAL correlated derived tables (the standard way to run a
  * per-row subquery that Catalyst decorrelates into a join), and the
  * ANSI PIVOT clause (the relational spreadsheet idiom, long API-only
  * as a11 — here through the parser). All three are pure parser-path
  * rows: the plans they produce are ordinary hash aggregates and
  * joins, so the 100 TB posture is whatever the equivalent API query
  * already has.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.11 (SQL surface), like x8/x10/x15/x19.
  */
object SurfaceR10be {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** X20: GROUP BY ALL — every non-aggregate select item becomes a
    * grouping key. Catalyst resolves it to a plain two-key hash
    * aggregate; cents stay exact BIGINT. */
  val x20GroupByAll: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("graft_x20_orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n,
        |  sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
        |FROM graft_x20_orders
        |GROUP BY ALL
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
  }

  /** X21: LATERAL derived table — for each distinct priority, a
    * correlated subquery over orders computes that priority's count
    * and max price. Spark decorrelates the LATERAL into a join +
    * aggregate (no per-row re-execution), which is exactly the plan
    * that survives scale; the oracle states the decorrelated
    * equivalent directly. */
  val x21LateralJoin: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("graft_x21_orders")
    s.sql(
      """SELECT p.o_orderpriority, t.n, t.max_cents
        |FROM (SELECT DISTINCT o_orderpriority FROM graft_x21_orders) p,
        |  LATERAL (
        |    SELECT count(*) AS n,
        |      max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS max_cents
        |    FROM graft_x21_orders o
        |    WHERE o.o_orderpriority = p.o_orderpriority) t
        |ORDER BY p.o_orderpriority""".stripMargin)
  }

  /** X22: PIVOT clause — priority rows × order-status columns, counts
    * in the cells. Spark's PIVOT plans as one hash aggregate with
    * conditional counters (no extra pass per output column); absent
    * cells surface as NULL, normalized to 0 so the contract is the
    * same as the CASE-WHEN twin the oracle states. */
  val x22SqlPivot: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("graft_x22_orders")
    s.sql(
      """SELECT o_orderpriority,
        |  coalesce(f, 0L) AS n_f, coalesce(o, 0L) AS n_o, coalesce(p, 0L) AS n_p
        |FROM (SELECT o_orderstatus, o_orderpriority FROM graft_x22_orders)
        |  PIVOT (count(*) FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
        |ORDER BY o_orderpriority""".stripMargin)
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "x20_group_by_all" -> x20GroupByAll,
    "x21_lateral_join" -> x21LateralJoin,
    "x22_sql_pivot" -> x22SqlPivot)

  val oracleSql: Map[String, String] = Map(
    "x20_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |GROUP BY ALL
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "x21_lateral_join" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "x22_sql_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
        |  CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
}
