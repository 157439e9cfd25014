package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 70: multivariate testing + window surface —
  * HOTELLING'S T² (the two-sample mean test in TWO dimensions at
  * once: did (quantity, net dollars) shift between shipping eras?
  * Separate t-tests miss correlated shifts, T² is the multivariate
  * answer), and the NTH_VALUE window function (the one rank-family
  * member the w-rows hadn't exercised). T² reduces to shared closed
  * forms over twelve exact integer sums — the 2×2 pooled covariance
  * is inverted symbolically (Cramer), so no linear algebra library
  * and no float accumulation order anywhere.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 (statistics), §2.4 (windows).
  */
object SurfaceR10br extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M154: Hotelling T² ----

  private def m(p: String, v: String) = s"(CAST(s$v$p AS DOUBLE) / n$p)"
  private def a(p: String, vv: String, v1: String, v2: String) =
    s"(CAST(s$vv$p AS DOUBLE) - CAST(s$v1$p AS DOUBLE) * s$v2$p / n$p)"
  private val pXX = s"((${a("1", "xx", "x", "x")} + ${a("2", "xx", "x", "x")}) / (n1 + n2 - 2))"
  private val pYY = s"((${a("1", "yy", "y", "y")} + ${a("2", "yy", "y", "y")}) / (n1 + n2 - 2))"
  private val pXY = s"((${a("1", "xy", "x", "y")} + ${a("2", "xy", "x", "y")}) / (n1 + n2 - 2))"
  private val dX = s"(${m("1", "x")} - ${m("2", "x")})"
  private val dY = s"(${m("1", "y")} - ${m("2", "y")})"
  private val det = s"($pXX * $pYY - $pXY * $pXY)"
  private val quad =
    s"(($dX * ($pYY * $dX - $pXY * $dY) + $dY * ($pXX * $dY - $pXY * $dX)) / $det)"
  private val t2 =
    s"((CAST(n1 AS DOUBLE) * n2 / (n1 + n2)) * $quad)"
  private val fStat =
    s"((CAST(n1 + n2 - 3 AS DOUBLE) / (2e0 * (n1 + n2 - 2))) * $t2)"

  /** M154: HOTELLING T² — (quantity, net-dollar) mean vector, early
    * vs late shipping era (l_shipdate < 1995-07-01). One conditional-
    * aggregate pass collects all twelve exact integer sums; the
    * pooled 2×2 covariance inverse is symbolic. F = (n−3)/(2(n−2))·T²
    * under H₀ ~ F(2, n−3); flag vs the 5% critical value 3.0. */
  val m154HotellingT2: Q = (s, d) => {
    val base = lineitem(s, d).select(
      when(col("l_shipdate").cast("date") < lit("1995-07-01").cast("date"), "1")
        .otherwise("2").as("era"),
      expr("CAST(l_quantity AS BIGINT)").as("x"),
      expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) DIV 100")
        .as("y"))
    def seg(p: String) = Seq(
      sum(when(col("era") === p, 1L).otherwise(0L)).as(s"n$p"),
      sum(when(col("era") === p, col("x")).otherwise(0L)).as(s"sx$p"),
      sum(when(col("era") === p, col("y")).otherwise(0L)).as(s"sy$p"),
      sum(when(col("era") === p, col("x") * col("x")).otherwise(0L)).as(s"sxx$p"),
      sum(when(col("era") === p, col("y") * col("y")).otherwise(0L)).as(s"syy$p"),
      sum(when(col("era") === p, col("x") * col("y")).otherwise(0L)).as(s"sxy$p"))
    val aggs = seg("1") ++ seg("2")
    base.agg(aggs.head, aggs.tail: _*)
      .select(col("n1"), col("n2"),
        r4(expr(dX)).as("d_qty"),
        r4(expr(dY)).as("d_dollars"),
        r4(expr(t2)).as("t2"),
        r4(expr(fStat)).as("f_stat"),
        expr(s"CAST(CASE WHEN $fStat > 3e0 THEN 1 ELSE 0 END AS BIGINT)")
          .as("sig_flag"))
  }

  // ---- W15: nth_value ----

  /** W15: NTH_VALUE — per priority: the 3rd-highest order value in
    * exact cents via nth_value over a fully-ordered frame (price
    * desc, key tiebreak), read off one representative row per group.
    * Partitioned by a 5-value key — the shape that scales. */
  val w15NthValue: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("cents").desc, col("o_orderkey"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val wRn = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("cents").desc, col("o_orderkey"))
    orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .withColumn("third", expr("nth_value(cents, 3)").over(w))
      .withColumn("top", first("cents").over(w))
      .withColumn("rn", row_number().over(wRn))
      .where(col("rn") === 1)
      .select(col("o_orderpriority"), col("top").as("top_cents"),
        col("third").as("third_cents"))
      .orderBy("o_orderpriority")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m154_hotelling_t2" -> m154HotellingT2,
    "w15_nth_value" -> w15NthValue)

  val oracleSql: Map[String, String] = Map(
    "m154_hotelling_t2" -> {
      def segSql(p: String, pred: String) =
        s"""CAST(sum(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS n$p,
          |    CAST(sum(CASE WHEN $pred THEN x ELSE 0 END) AS BIGINT) AS sx$p,
          |    CAST(sum(CASE WHEN $pred THEN y ELSE 0 END) AS BIGINT) AS sy$p,
          |    CAST(sum(CASE WHEN $pred THEN x * x ELSE 0 END) AS BIGINT) AS sxx$p,
          |    CAST(sum(CASE WHEN $pred THEN y * y ELSE 0 END) AS BIGINT) AS syy$p,
          |    CAST(sum(CASE WHEN $pred THEN x * y ELSE 0 END) AS BIGINT) AS sxy$p""".stripMargin
      s"""WITH base AS (
        |  SELECT CASE WHEN CAST(l_shipdate AS DATE) < DATE '1995-07-01'
        |      THEN '1' ELSE '2' END AS era,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) // 100 AS y
        |  FROM lineitem),
        |sums AS (
        |  SELECT ${segSql("1", "era = '1'")},
        |    ${segSql("2", "era = '2'")}
        |  FROM base)
        |SELECT n1, n2,
        |  round($dX, 4) AS d_qty,
        |  round($dY, 4) AS d_dollars,
        |  round($t2, 4) AS t2,
        |  round($fStat, 4) AS f_stat,
        |  CAST(CASE WHEN $fStat > 3e0 THEN 1 ELSE 0 END AS BIGINT) AS sig_flag
        |FROM sums""".stripMargin
    },
    "w15_nth_value" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |vals AS (
        |  SELECT o_orderpriority,
        |    nth_value(cents, 3) OVER (PARTITION BY o_orderpriority
        |      ORDER BY cents DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third,
        |    first_value(cents) OVER (PARTITION BY o_orderpriority
        |      ORDER BY cents DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS topv,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY cents DESC, o_orderkey) AS rn
        |  FROM ranked)
        |SELECT o_orderpriority,
        |  CAST(topv AS BIGINT) AS top_cents,
        |  CAST(third AS BIGINT) AS third_cents
        |FROM vals WHERE rn = 1
        |ORDER BY o_orderpriority""".stripMargin)
}
