package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 68: survey-sampling design + SQL function
  * surface — NEYMAN OPTIMAL ALLOCATION (split a fixed sampling budget
  * across strata ∝ N_h·S_h, the variance-minimizing design; lp37's
  * largest-remainder machinery reused, but with variance-weighted
  * quotas instead of proportional ones — the difference between "fair"
  * and "efficient" sampling), and the BITWISE AGGREGATE family
  * (bit_and/bit_or/bit_xor — the last untouched built-in AGGREGATE
  * group; f12 covers the scalar bitwise operators, these fold masks
  * ACROSS rows, the permission-mask / bloom-word reduction). Stratum SDs come from exact integer dollar sums via one
  * shared formula; the largest-remainder ranking runs over the 5-row
  * stratum table (bounded window).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.8 (sampling), §2.11 (SQL surface).
  */
object SurfaceR10bp extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LP63: Neyman allocation ----

  private val nySd =
    "sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / nh) / (nh - 1))"
  private val nyW = s"(CAST(nh AS DOUBLE) * $nySd)"

  /** LP63: NEYMAN ALLOCATION — budget T=1000 across order priorities
    * ∝ N_h·S_h (S_h = stratum SD of whole-dollar totals, exact sums).
    * Integerized by floor + largest fractional remainder (ranked on
    * the shared float formula over the bounded 5-row stratum table),
    * so Σ n_h = 1000 by construction. */
  val lp63NeymanAllocation: Q = (s, d) => {
    val strata = orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 100").as("x"))
      .groupBy("grp")
      .agg(count(lit(1)).as("nh"), sum("x").as("s1"),
        sum(expr("x * x")).as("s2"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.graft.BoundedPartition.key)
    val wCum = Windows.bounded(col("grp"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val quotas = strata
      .withColumn("w", expr(nyW))
      // ordered nonnegative cumsum -> order-pinned total weight
      .withColumn("cw", sum("w").over(wCum))
      .withColumn("wtot", max("cw").over(wAll))
      .withColumn("q", expr("1000e0 * w / wtot"))
      .withColumn("base", expr("CAST(floor(q) AS BIGINT)"))
      .withColumn("frac", expr("q - floor(q)"))
      .withColumn("btot", sum("base").over(wAll))
      .withColumn("rk", row_number().over(
        Windows.bounded(col("frac").desc, col("grp"))))
    quotas
      .withColumn("alloc",
        col("base") + when(col("rk") <= lit(1000L) - col("btot"), 1L)
          .otherwise(0L))
      .select(col("grp"), col("nh"),
        r4(expr(nySd)).as("sd"),
        r4(expr("w / wtot")).as("share"),
        col("alloc"))
      .orderBy("grp")
  }

  // ---- F29: bitwise functions ----

  /** F29: BITWISE SURFACE — per priority: bit_and/bit_or/bit_xor over
    * a 16-bit key-derived mask, plus shift/extract scalars folded in
    * (shiftleft, shiftright, bitwise &, |, ^, ~ on the row level).
    * Pure integer ops — bit-identical by construction. */
  val f29Bitwise: Q = (s, d) =>
    orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        expr("CAST((o_orderkey % 65536) AS BIGINT)").as("m"))
      .select(col("grp"),
        expr("shiftleft(m, 1) & 65535").as("m1"),
        expr("shiftright(m, 2) | 4096").as("m2"),
        expr("m ^ 21845").as("m3"))
      .groupBy("grp")
      .agg(expr("bit_and(m1)").as("and_m1"),
        expr("bit_or(m2)").as("or_m2"),
        expr("bit_xor(m3)").as("xor_m3"),
        count(lit(1)).as("n"))
      .orderBy("grp")

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp63_neyman_allocation" -> lp63NeymanAllocation,
    "f29_bitwise" -> f29Bitwise)

  val oracleSql: Map[String, String] = Map(
    "lp63_neyman_allocation" ->
      s"""WITH strata AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(count(*) AS BIGINT) AS nh,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100) AS BIGINT) AS s1,
        |    CAST(sum((CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100) *
        |             (CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 100)) AS BIGINT) AS s2
        |  FROM orders GROUP BY 1),
        |tot AS (
        |  SELECT max(cw) AS wtot FROM (
        |    SELECT sum($nyW) OVER (ORDER BY grp ROWS UNBOUNDED PRECEDING) AS cw
        |    FROM strata) c),
        |q AS (
        |  SELECT s.*, $nyW AS w, t.wtot,
        |    1000e0 * $nyW / t.wtot AS quota
        |  FROM strata s CROSS JOIN tot t),
        |ranked AS (
        |  SELECT grp, nh, s1, s2, w, wtot,
        |    CAST(floor(quota) AS BIGINT) AS base,
        |    CAST(sum(CAST(floor(quota) AS BIGINT)) OVER () AS BIGINT) AS btot,
        |    row_number() OVER (ORDER BY quota - floor(quota) DESC, grp) AS rk
        |  FROM q)
        |SELECT grp, nh,
        |  round($nySd, 4) AS sd,
        |  round(w / wtot, 4) AS share,
        |  CAST(base + CASE WHEN rk <= 1000 - btot THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM ranked
        |ORDER BY grp""".stripMargin,
    "f29_bitwise" ->
      """WITH masked AS (
        |  SELECT o_orderpriority AS grp,
        |    ((o_orderkey % 65536) << 1) & 65535 AS m1,
        |    ((o_orderkey % 65536) >> 2) | 4096 AS m2,
        |    xor(o_orderkey % 65536, 21845) AS m3
        |  FROM orders)
        |SELECT grp,
        |  CAST(bit_and(m1) AS BIGINT) AS and_m1,
        |  CAST(bit_or(m2) AS BIGINT) AS or_m2,
        |  CAST(bit_xor(m3) AS BIGINT) AS xor_m3,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM masked
        |GROUP BY grp
        |ORDER BY grp""".stripMargin)
}
