package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 76: ordinal association + robust shift —
  * GOODMAN–KRUSKAL GAMMA (association between two ORDERED categorical
  * scales via concordant/discordant pairs; m105's Kendall τ ranks
  * numeric series, γ is the contingency-table form analysts use for
  * ordinal×ordinal) and the HODGES–LEHMANN estimator (the median of
  * all cross-pair differences — the robust "how big is the shift"
  * companion to m47's Mann–Whitney "is there a shift"). Both are
  * EXACT: γ's C/D counts come from a self-join of the bounded 5×4
  * cell table, and HL runs on the cross-product of the two eras'
  * bounded distinct-count grids with the ×2 integer-median trick.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (statistics), siblings m105/m47/m77.
  */
object SurfaceR10bx extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M160: Goodman–Kruskal gamma ----

  /** M160: GK GAMMA — priority rank (1..5) vs fixed dollar bucket
    * (0–50k/50–100k/100–150k/150k+). C = Σ n_ij·N(i'>i, j'>j),
    * D = Σ n_ij·N(i'>i, j'<j) from a 20-cell self-join — exact
    * integers; γ = (C−D)/(C+D). */
  val m160GkGamma: Q = (s, d) => {
    val cells = orders(s, d)
      .select(
        expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("i"),
        expr("least(CAST(floor(o_totalprice / 50000) AS BIGINT), 3)").as("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("n"))
    val pairs = cells.as("a").join(cells.as("b"),
      col("b.i") > col("a.i"))
    pairs
      .agg(
        sum(when(col("b.j") > col("a.j"), col("a.n") * col("b.n"))
          .otherwise(0L)).as("c_pairs"),
        sum(when(col("b.j") < col("a.j"), col("a.n") * col("b.n"))
          .otherwise(0L)).as("d_pairs"))
      .select(col("c_pairs"), col("d_pairs"),
        r4(expr(
          "(CAST(c_pairs AS DOUBLE) - d_pairs) / (CAST(c_pairs AS DOUBLE) + d_pairs)"))
          .as("gamma"))
  }

  // ---- M161: Hodges–Lehmann ----

  /** M161: HODGES–LEHMANN — the median of all n₁·n₂ differences
    * between era-1 and era-2 daily order counts, WITHOUT
    * materializing the pairs: the two bounded distinct-count grids
    * cross-join (≤ V² rows, V = distinct daily counts), each
    * difference carries weight c₁·c₂, and the median is read off the
    * cumulative weight axis with the ×2 integer trick (hl2 = lower +
    * upper median, exact; hl = hl2/2). */
  val m161HodgesLehmann: Q = (s, d) => {
    val daily = orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
    val g1 = daily.where(col("t") < 1277).groupBy("y").agg(count(lit(1)).as("c1"))
    val g2 = daily.where(col("t") >= 1277).groupBy("y").agg(count(lit(1)).as("c2"))
    val diffs = g1.as("a").crossJoin(g2.as("b"))
      .select((col("a.y") - col("b.y")).as("dd"),
        (col("c1") * col("c2")).as("w"))
      .groupBy("dd").agg(sum("w").as("w"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.graft.BoundedPartition.key)
    val wCum = Windows.bounded(col("dd"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    diffs
      .withColumn("p", sum("w").over(wAll))
      .withColumn("cum", sum("w").over(wCum))
      .withColumn("lo_ok", col("cum") >= expr("(p + 1) DIV 2"))
      .withColumn("hi_ok", col("cum") >= expr("p DIV 2 + 1"))
      .agg(
        max("p").as("n_pairs"),
        min(when(col("lo_ok"), col("dd"))).as("m_lo"),
        min(when(col("hi_ok"), col("dd"))).as("m_hi"))
      .select(col("n_pairs"),
        (col("m_lo") + col("m_hi")).as("hl2"),
        r4(expr("CAST(m_lo + m_hi AS DOUBLE) / 2e0")).as("hl"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m160_gk_gamma" -> m160GkGamma,
    "m161_hodges_lehmann" -> m161HodgesLehmann)

  val oracleSql: Map[String, String] = Map(
    "m160_gk_gamma" ->
      """WITH cells AS (
        |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS i,
        |    least(CAST(floor(o_totalprice / 50000) AS BIGINT), 3) AS j,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2),
        |pairs AS (
        |  SELECT
        |    CAST(sum(CASE WHEN b.j > a.j THEN a.n * b.n ELSE 0 END) AS BIGINT) AS c_pairs,
        |    CAST(sum(CASE WHEN b.j < a.j THEN a.n * b.n ELSE 0 END) AS BIGINT) AS d_pairs
        |  FROM cells a JOIN cells b ON b.i > a.i)
        |SELECT c_pairs, d_pairs,
        |  round((CAST(c_pairs AS DOUBLE) - d_pairs) / (CAST(c_pairs AS DOUBLE) + d_pairs), 4) AS gamma
        |FROM pairs""".stripMargin,
    "m161_hodges_lehmann" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |g1 AS (SELECT y, CAST(count(*) AS BIGINT) AS c1 FROM daily WHERE t < 1277 GROUP BY y),
        |g2 AS (SELECT y, CAST(count(*) AS BIGINT) AS c2 FROM daily WHERE t >= 1277 GROUP BY y),
        |diffs AS (
        |  SELECT a.y - b.y AS dd, CAST(sum(c1 * c2) AS BIGINT) AS w
        |  FROM g1 a CROSS JOIN g2 b
        |  GROUP BY 1),
        |cums AS (
        |  SELECT dd, w,
        |    CAST(sum(w) OVER () AS BIGINT) AS p,
        |    CAST(sum(w) OVER (ORDER BY dd ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM diffs)
        |SELECT CAST(max(p) AS BIGINT) AS n_pairs,
        |  CAST(min(CASE WHEN cum >= (p + 1) // 2 THEN dd END)
        |    + min(CASE WHEN cum >= p // 2 + 1 THEN dd END) AS BIGINT) AS hl2,
        |  round(CAST(min(CASE WHEN cum >= (p + 1) // 2 THEN dd END)
        |    + min(CASE WHEN cum >= p // 2 + 1 THEN dd END) AS DOUBLE) / 2e0, 4) AS hl
        |FROM cums""".stripMargin)
}
