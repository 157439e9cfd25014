package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 11: the classic TPC-H DECORRELATION shapes not
  * yet in the registry — Q17 (correlated scalar average), Q18 (HAVING
  * over a grouped semi-source), Q21 (EXISTS + NOT EXISTS double
  * correlation), Q22 (scalar subquery + anti-join), Q15 (view max
  * selection). These exercise exactly the rewrites a warehouse engine
  * must get right at scale: every correlated predicate becomes a keyed
  * aggregate + equi-join (never a per-row subquery), EXISTS becomes
  * left-semi, NOT EXISTS left-anti. Fixture columns differ from the
  * spec (no receipt/commit dates), so lateness is ship-vs-order-date;
  * the *shapes* are the point (FIXTURES.md:54-56).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.2 (query shapes), §3 (lifecycle/decorrelation).
  */
object SurfaceR10k extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Q36 (TPC-H Q17 shape): revenue of small-quantity line items —
    * l_quantity below half the per-part average, one brand. The
    * correlated `(SELECT avg(..) WHERE same part)` becomes a per-part
    * aggregate joined back on partkey; the brand filter prunes via the
    * broadcast part dimension before the fact join. */
  val q36AvgSubquery: Q = (s, d) => {
    val pa = lineitem(s, d).groupBy("l_partkey")
      .agg((avg(col("l_quantity")) * 0.5).as("t"))
    val brand = part(s, d).where(col("p_brand") === "Brand#23")
      .select("p_partkey")
    lineitem(s, d)
      .join(broadcast(brand), col("l_partkey") === col("p_partkey"))
      .join(pa, "l_partkey")
      .where(col("l_quantity") < col("t"))
      .agg(count(lit(1)).as("n_items"),
        r4(sum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  /** Q37 (TPC-H Q18 shape): large-volume orders — HAVING sum(qty) > 180
    * pushed into a grouped semi-source, then joined to orders+customer.
    * The group-filter runs ON the fact before any dimension join, so
    * the expensive joins see only qualifying orders. */
  val q37HavingTop: Q = (s, d) => {
    val big = lineitem(s, d).groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .where(col("sum_qty") > 180)
    big.join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), r4(col("o_totalprice")).as("o_totalprice"),
        r4(col("sum_qty")).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q38 (TPC-H Q21 shape): suppliers who were the ONLY late shipper in
    * a multi-supplier order (lateness = shipped > 100 days after the
    * order date). The double correlation — EXISTS(other supplier in
    * order) AND NOT EXISTS(other LATE supplier in order) — becomes one
    * left-semi and one left-anti join keyed on orderkey, both
    * condition-joined on supplier inequality: no per-row subquery
    * execution at any scale. */
  val q38ExistsNotExists: Q = (s, d) => {
    val l = lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 100 DAYS"))
          .as("late"))
    val l1 = l.where(col("late"))
      .select(col("ok"), col("sk"))
    val l2 = l.select(col("ok").as("ok2"), col("sk").as("sk2"))
    val l3 = l.where(col("late"))
      .select(col("ok").as("ok3"), col("sk").as("sk3"))
    val solo = l1
      .join(l2, col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
      .join(l3, col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
    solo.groupBy("sk").agg(count(lit(1)).as("numwait"))
      .join(supplier(s, d), col("sk") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(25)
  }

  /** Q39 (TPC-H Q22 shape): well-funded customers in selected nations
    * with no RECENT order (every fixture customer has some order, so
    * the dormancy window keeps the anti-join non-vacuous) — a scalar
    * average subquery (broadcast one-row cross join) plus a left-anti
    * join against the filtered orders, grouped by nation. */
  val q39ColdCustomers: Q = (s, d) => {
    val nations = Seq(1, 3, 5, 7, 9, 11, 13)
    val avgBal = customer(s, d)
      .where(col("c_acctbal") > 0 && col("c_nationkey").isin(nations: _*))
      .agg(avg(col("c_acctbal")).as("ab"))
    val recent = orders(s, d)
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
    customer(s, d)
      .where(col("c_nationkey").isin(nations: _*))
      .crossJoin(broadcast(avgBal))
      .where(col("c_acctbal") > col("ab"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), r4(sum(col("c_acctbal"))).as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** Q40 (TPC-H Q15 shape): the top supplier(s) by quarterly revenue —
    * the revenue "view" is a per-supplier aggregate, its max a one-row
    * broadcast, and the selection an equality join against that scalar.
    * Revenue is compared on the house 1e-4 grid on BOTH engines, so the
    * equality is exact; ties (multiple max suppliers) all return. */
  val q40ViewMax: Q = (s, d) => {
    val rev = lineitem(s, d)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(r4(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .where(col("total_revenue") === col("mx"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "q36_avg_subquery" -> q36AvgSubquery,
    "q37_having_top" -> q37HavingTop,
    "q38_exists_notexists" -> q38ExistsNotExists,
    "q39_cold_customers" -> q39ColdCustomers,
    "q40_view_max" -> q40ViewMax)

  val oracleSql: Map[String, String] = Map(
    "q36_avg_subquery" ->
      """WITH pa AS (
        |  SELECT l_partkey, 0.5 * avg(l_quantity) AS t
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_items,
        |  round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#23'
        |JOIN pa USING (l_partkey)
        |WHERE l_quantity < t""".stripMargin,
    "q37_having_top" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 180)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  round(o_totalprice, 4) AS o_totalprice,
        |  round(sum_qty, 4) AS sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY round(o_totalprice, 4) DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q38_exists_notexists" ->
      """WITH l AS (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk,
        |    l_shipdate > o_orderdate + INTERVAL 100 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |, agg AS (
        |  SELECT l1.sk, CAST(count(*) AS BIGINT) AS numwait
        |  FROM l l1
        |  WHERE l1.late
        |    AND EXISTS (SELECT 1 FROM l l2
        |                WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
        |    AND NOT EXISTS (SELECT 1 FROM l l3
        |                    WHERE l3.ok = l1.ok AND l3.sk <> l1.sk AND l3.late)
        |  GROUP BY l1.sk)
        |SELECT s_name, numwait
        |FROM agg JOIN supplier ON s_suppkey = sk
        |ORDER BY numwait DESC, s_name
        |LIMIT 25""".stripMargin,
    "q39_cold_customers" ->
      """WITH ab AS (
        |  SELECT avg(c_acctbal) AS ab FROM customer
        |  WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |  round(sum(c_acctbal), 4) AS totacctbal
        |FROM customer CROSS JOIN ab
        |WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        |  AND c_acctbal > ab
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q40_view_max" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1),
        |mx AS (SELECT max(total_revenue) AS mx FROM rev)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev CROSS JOIN mx
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = mx
        |ORDER BY s_suppkey""".stripMargin)
}
