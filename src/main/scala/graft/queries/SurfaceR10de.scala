package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 109: empirical-Bayes rate shrinkage and the
  * Conover–Iman post-hoc.
  *
  * Contrast with near-siblings: m110 (Wilson) bounds ONE proportion's
  * uncertainty and m89 a ratio metric's — both per-group, no pooling;
  * m187 fits a beta prior ACROSS suppliers by method of moments and
  * shrinks every small-sample return rate toward the portfolio mean —
  * the empirical-Bayes smoothing that stops a 3-shipment supplier
  * from topping a quality ranking (lp38/lq score; nothing calibrates
  * scores across groups). m188 vs m152: Kruskal–Wallis answers "do
  * ANY weekdays differ"; Conover–Iman answers WHICH PAIRS, with
  * rank-based t statistics on the POOLED rank variance and the
  * (N−1−H)/(N−k) deflator — the valid follow-up, unlike naive
  * pairwise Mann–Whitney which re-ranks per pair and loses the pooled
  * tie correction.
  *
  * Float discipline: m187 quantizes each supplier rate to 1e6 before
  * the across-supplier moment sums (quantize-before-sum; squares in
  * DECIMAL(38,0)/HUGEINT), so α/β derive from exact integers via one
  * shared closing text. m188 reuses m152's exact midrank machinery —
  * 2·midrank = 2·C_below + c + 1 on the bounded value grid, rank sums
  * and Σ(2r)² exact integers, and each pairwise t is one shared
  * formula; the Σ over the value grid rides the same bounded-window
  * cumsum as m152.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13; siblings m110/m89 (SurfaceR10q/a-family),
  * m152 (SurfaceR10bo), m47 (Mann–Whitney).
  */
object SurfaceR10de extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M187: beta-binomial shrinkage ----

  /** MoM prior from the quantized rate moments; degenerate variance
    * falls back to the uniform prior (shared text). */
  private val bbMean = "(CAST(sq AS DOUBLE) / k / 1e6)"
  private val bbVar =
    s"((CAST(sqq AS DOUBLE) / 1e12 - k * $bbMean * $bbMean) / (k - 1))"
  private val bbC =
    s"(CASE WHEN $bbVar > 0 AND $bbMean > 0 AND $bbMean < 1 " +
      s"THEN $bbMean * (1 - $bbMean) / $bbVar - 1 ELSE 0 END)"
  private val bbAlpha =
    s"(CASE WHEN $bbC > 0 THEN $bbMean * $bbC ELSE 1e0 END)"
  private val bbBeta =
    s"(CASE WHEN $bbC > 0 THEN (1 - $bbMean) * $bbC ELSE 1e0 END)"

  /** M187: BETA-BINOMIAL SHRINKAGE — per-supplier return rate
    * (l_returnflag = 'R'), beta prior fitted by method of moments over
    * ALL suppliers, posterior mean (x+α)/(n+α+β) as the shrunken
    * rate. Readout: suppliers 1..20 (deterministic panel) with raw vs
    * shrunk side by side plus the fitted prior.
    *
    * Scale shape: one hash agg to per-supplier (n, x); the prior is a
    * second agg over quantized-integer rates (order-free); shrinkage
    * is a broadcast of two scalars back over the supplier table.
    */
  val m187BetaBinomial: Q = (s, d) => {
    val per = lineitem(s, d).groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("x"))
      .withColumn("qp",
        expr("CAST(floor(CAST(x AS DOUBLE) / n * 1e6 + 0.5) AS BIGINT)"))
    val prior = per.agg(count(lit(1)).as("k"), sum("qp").as("sq"),
        sum(expr("CAST(qp AS DECIMAL(38,0)) * qp")).as("sqq"))
      .select(expr(bbAlpha).as("alpha"), expr(bbBeta).as("beta"))
    per.crossJoin(broadcast(prior))
      .where(col("suppkey") <= 20)
      .select(col("suppkey"), col("n"), col("x"),
        r4(expr("CAST(x AS DOUBLE) / n")).as("raw_rate"),
        r4(expr("(x + alpha) / (n + alpha + beta)")).as("shrunk_rate"),
        r4(col("alpha")).as("alpha"), r4(col("beta")).as("beta"))
      .orderBy("suppkey")
  }

  // ---- M188: Conover–Iman pairwise post-hoc ----

  /** Pooled rank variance from the exact doubled-rank sums:
    * S² = (Σr² − N(N+1)²/4)/(N−1), with Σr² = sr4/4. Shared text. */
  private val ciS2 =
    "((CAST(sr4 AS DOUBLE) / 4 - CAST(n AS DOUBLE) * (n + 1) * (n + 1) / 4)" +
      " / (n - 1))"
  /** The tie-robust KW statistic T = (ΣR²/n − N(N+1)²/4)/S² (for the
    * Conover deflator). */
  private val ciH =
    s"((sr2term - CAST(n AS DOUBLE) * (n + 1) * (n + 1) / 4) * " +
      s"(n - 1) / (CAST(sr4 AS DOUBLE) / 4 - " +
      s"CAST(n AS DOUBLE) * (n + 1) * (n + 1) / 4))"
  private val ciT =
    s"((CAST(r2i AS DOUBLE) / (2 * ni) - CAST(r2j AS DOUBLE) / (2 * nj)) / " +
      s"sqrt($ciS2 * (CAST(n AS DOUBLE) - 1 - $ciH) / (n - 7) * " +
      s"(1e0 / ni + 1e0 / nj)))"

  /** M188: CONOVER–IMAN — after m152's Kruskal–Wallis on daily order
    * counts by weekday, the 21 pairwise rank-t statistics with the
    * pooled variance and (N−1−H)/(N−k) deflator; |t| > 1.96 flags the
    * pair (df = N−k is large; stated). Midranks exact via the ×2
    * grid trick.
    *
    * Scale shape: identical bounded grids to m152 (distinct daily
    * counts × 7 weekdays); the pair table is a 7×7 broadcast self-
    * join — nothing scales with the fact table beyond the daily agg.
    */
  val m188ConoverIman: Q = (s, d) => {
    val dailyCounts = orders(s, d)
      .select(datediff(col("o_orderdate"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
    val marked = dailyCounts.withColumn("dow", col("t") % 7)
    val wCumV = Windows.bounded(col("y"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = marked.groupBy("y").agg(count(lit(1)).as("cv"))
      .withColumn("cbelow", sum("cv").over(wCumV) - col("cv"))
    val cells = marked.groupBy("y", "dow").agg(count(lit(1)).as("cnt"))
    val ranked = cells.join(grid, "y")
      .select(col("dow"), col("cnt"),
        (col("cnt") * (lit(2L) * col("cbelow") + col("cv") + 1L)).as("r2c"))
    val groups = ranked.groupBy("dow")
      .agg(sum("cnt").as("nj"), sum("r2c").as("r2j"))
    // Σ(2r)² over the grid: each value y contributes c·(2·mid)²
    val sr4 = grid.agg(
      sum(expr("cv * (2 * cbelow + cv + 1) * (2 * cbelow + cv + 1)"))
        .as("sr4"),
      sum("cv").as("n"))
    val wCumD = Windows.bounded(col("dow"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sr2t = groups
      .withColumn("term", expr("CAST(r2j AS DOUBLE) * r2j / (4e0 * nj)"))
      .withColumn("cterm", sum("term").over(wCumD))
      .agg(max("cterm").as("sr2term"))
    val pairs = groups.select(col("dow").as("di"), col("nj").as("ni"),
        col("r2j").as("r2i"))
      .join(groups.select(col("dow").as("dj"), col("nj"), col("r2j")),
        col("di") < col("dj"))
    pairs.crossJoin(broadcast(sr4)).crossJoin(broadcast(sr2t))
      .select(col("di"), col("dj"), col("ni"), col("nj"),
        r4(expr("CAST(r2i AS DOUBLE) / (2 * ni)")).as("mean_rank_i"),
        r4(expr("CAST(r2j AS DOUBLE) / (2 * nj)")).as("mean_rank_j"),
        r4(expr(ciT)).as("t_stat"),
        expr(s"abs($ciT) > 1.96").as("differs_5pct"))
      .orderBy("di", "dj")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m187_beta_binomial" -> m187BetaBinomial,
    "m188_conover_iman" -> m188ConoverIman)

  val oracleSql: Map[String, String] = Map(
    "m187_beta_binomial" ->
      s"""WITH per AS MATERIALIZED (
        |  SELECT l_suppkey AS suppkey, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x
        |  FROM lineitem GROUP BY 1),
        |q AS MATERIALIZED (
        |  SELECT suppkey, n, x,
        |    CAST(floor(CAST(x AS DOUBLE) / n * 1e6 + 0.5) AS BIGINT) AS qp
        |  FROM per),
        |prior AS (
        |  SELECT $bbAlpha AS alpha, $bbBeta AS beta FROM (
        |    SELECT CAST(count(*) AS BIGINT) AS k,
        |      CAST(sum(qp) AS BIGINT) AS sq,
        |      CAST(sum(CAST(qp AS HUGEINT) * qp) AS HUGEINT) AS sqq
        |    FROM q))
        |SELECT suppkey, n, x,
        |  round(CAST(x AS DOUBLE) / n, 4) AS raw_rate,
        |  round((x + alpha) / (n + alpha + beta), 4) AS shrunk_rate,
        |  round(alpha, 4) AS alpha, round(beta, 4) AS beta
        |FROM q CROSS JOIN prior
        |WHERE suppkey <= 20 ORDER BY suppkey""".stripMargin,
    "m188_conover_iman" ->
      s"""WITH dailyc AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |marked AS MATERIALIZED (
        |  SELECT t, y, t % 7 AS dow FROM dailyc),
        |grid AS MATERIALIZED (
        |  SELECT y, cv,
        |    CAST(sum(cv) OVER (ORDER BY y) - cv AS BIGINT) AS cbelow
        |  FROM (SELECT y, CAST(count(*) AS BIGINT) AS cv
        |        FROM marked GROUP BY 1)),
        |cells AS (
        |  SELECT y, dow, CAST(count(*) AS BIGINT) AS cnt
        |  FROM marked GROUP BY 1, 2),
        |groups_ AS MATERIALIZED (
        |  SELECT dow, CAST(sum(cnt) AS BIGINT) AS nj,
        |    CAST(sum(cnt * (2 * cbelow + cv + 1)) AS BIGINT) AS r2j
        |  FROM cells c JOIN grid g USING (y) GROUP BY 1),
        |sr4 AS (
        |  SELECT CAST(sum(cv * (2 * cbelow + cv + 1) * (2 * cbelow + cv + 1))
        |      AS BIGINT) AS sr4,
        |    CAST(sum(cv) AS BIGINT) AS n
        |  FROM grid),
        |sr2m AS (
        |  -- ordered cumsum's final value, not a bare 7-row sum, for
        |  -- engine-order parity with the Spark side
        |  SELECT max(ct) AS sr2term FROM (
        |    SELECT sum(CAST(r2j AS DOUBLE) * r2j / (4e0 * nj))
        |      OVER (ORDER BY dow) AS ct FROM groups_)),
        |pairs AS (
        |  SELECT a.dow AS di, b.dow AS dj, a.nj AS ni, b.nj,
        |    a.r2j AS r2i, b.r2j
        |  FROM groups_ a JOIN groups_ b ON a.dow < b.dow)
        |SELECT di, dj, ni, nj,
        |  round(CAST(r2i AS DOUBLE) / (2 * ni), 4) AS mean_rank_i,
        |  round(CAST(r2j AS DOUBLE) / (2 * nj), 4) AS mean_rank_j,
        |  round($ciT, 4) AS t_stat,
        |  abs($ciT) > 1.96 AS differs_5pct
        |FROM pairs CROSS JOIN sr4 CROSS JOIN sr2m
        |ORDER BY di, dj""".stripMargin)
}
