package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 12: segmentation + association statistics —
  * RFM customer segmentation (quantile-threshold form, no global
  * window), Cohen's kappa inter-rater agreement (the labeling-pipeline
  * QA statistic), Cramér's V + chi-square on a contingency table,
  * mutual information / entropy between two categoricals, and
  * skewness/kurtosis from exact raw-moment sums.
  *
  * Cross-engine float discipline: every formula that runs on doubles is
  * ONE SQL text shared verbatim by the Spark side (`expr`) and the
  * DuckDB oracle, over exact-integer aggregate inputs — both engines
  * execute the identical IEEE op sequence, so the 1e-4 oracle grid is
  * bit-stable (the SurfaceR10i geohash / a34 moment precedent).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.5 (aggregation), §2.13 (statistics).
  */
object SurfaceR10l extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- Q41: RFM segmentation ----

  /** Q41: RFM SEGMENTATION — recency/frequency/monetary quartile
    * segments per customer, aggregated to segment counts. Deliberately
    * window-free: a global `ntile(4)` funnels every customer through
    * one task, so the quartile BREAKPOINTS are computed as three
    * scalars per dimension (exact percentile over the customer
    * aggregate) and broadcast back — the assignment is then an
    * embarrassingly parallel comparison, the shape that survives 10⁹
    * customers. Monetary is snapped to exact integer CENTS right at the
    * per-customer aggregate (totalprice has 2 decimals, so sum·100 is
    * within ~1e-9 of an integer and floor(·+0.5) lands identically on
    * both engines) — every comparison and average downstream is then
    * integer-exact, immune to float-sum ordering; recency/frequency are
    * exact integers by construction. */
  val q41Rfm: Q = (s, d) => {
    val cust = orders(s, d).groupBy("o_custkey").agg(
      datediff(lit("1998-12-31").cast("date"),
        max(col("o_orderdate")).cast("date")).cast("long").as("rec"),
      count(lit(1)).as("freq"),
      floor(sum("o_totalprice") * lit(100) + lit(0.5)).cast("long").as("mon"))
    val bp = cust.agg(
      expr("percentile(rec, 0.25)").as("r1"),
      expr("percentile(rec, 0.50)").as("r2"),
      expr("percentile(rec, 0.75)").as("r3"),
      expr("percentile(freq, 0.25)").as("f1"),
      expr("percentile(freq, 0.50)").as("f2"),
      expr("percentile(freq, 0.75)").as("f3"),
      expr("percentile(mon, 0.25)").as("m1"),
      expr("percentile(mon, 0.50)").as("m2"),
      expr("percentile(mon, 0.75)").as("m3"))
    def seg(v: String, q1: String, q2: String, q3: String) =
      lit(1) + when(col(v) > col(q1), 1).otherwise(0) +
        when(col(v) > col(q2), 1).otherwise(0) +
        when(col(v) > col(q3), 1).otherwise(0)
    cust.crossJoin(broadcast(bp))
      .select(
        seg("rec", "r1", "r2", "r3").as("rseg"),
        seg("freq", "f1", "f2", "f3").as("fseg"),
        seg("mon", "m1", "m2", "m3").as("mseg"),
        col("mon"))
      .groupBy("rseg", "fseg", "mseg")
      .agg(count(lit(1)).as("n_customers"), sum("mon").as("mon_sum"),
        count(lit(1)).as("nc"))
      .select(col("rseg"), col("fseg"), col("mseg"), col("n_customers"),
        r4(expr("CAST(mon_sum AS DOUBLE) / (100.0 * nc)")).as("avg_monetary"))
      .orderBy("rseg", "fseg", "mseg")
  }

  // ---- M76: Cohen's kappa ----

  /** M76: COHEN'S KAPPA — chance-corrected agreement between two
    * binary "raters" (a rule on priority vs a rule on price), the
    * standard QA statistic for comparing two labeling passes over a
    * training corpus (model-vs-model or annotator-vs-heuristic). One
    * conditional aggregate produces the four exact counts; κ is a
    * closed-form on them. At 100 TB this is a single map-side-combined
    * agg — no shuffle beyond the final 1-row combine. */
  val m76CohenKappa: Q = (s, d) =>
    orders(s, d)
      .agg(
        count(lit(1)).as("n"),
        count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
          .as("na_hi"),
        count(when(col("o_totalprice") > 150000.0, 1)).as("nb_hi"),
        count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH") ===
          (col("o_totalprice") > 150000.0), 1)).as("agree"))
      .select(col("n"), col("na_hi"), col("nb_hi"), col("agree"),
        r4(expr(kappaPoSql)).as("po"),
        r4(expr(kappaPeSql)).as("pe"),
        r4(expr(kappaSql)).as("kappa"))

  private val kappaPoSql = "(CAST(agree AS DOUBLE) / n)"
  private val kappaPeSql =
    "((CAST(na_hi AS DOUBLE) * nb_hi + CAST(n - na_hi AS DOUBLE) * (n - nb_hi)) / (CAST(n AS DOUBLE) * n))"
  private val kappaSql = s"(($kappaPoSql - $kappaPeSql) / (1.0 - $kappaPeSql))"

  // ---- M77: chi-square + Cramér's V ----

  /** M77: CRAMÉR'S V — chi-square independence on the returnflag ×
    * linestatus contingency table plus the normalized effect size
    * V = sqrt(χ²/(n·min(r-1,c-1))). Margins come from re-aggregating
    * the cell counts (6 rows), so the fact table is scanned once; the
    * margin joins are broadcast-sized by construction (bounded by the
    * category-pair cardinality, not the data). */
  val m77CramersV: Q = (s, d) => {
    val cells = lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("c"))
    val rows = cells.groupBy("l_returnflag").agg(sum("c").as("rtot"))
    val cols = cells.groupBy("l_linestatus").agg(sum("c").as("ctot"))
    val tot = cells.agg(sum("c").as("n"),
      countDistinct("l_returnflag").as("r"),
      countDistinct("l_linestatus").as("cc"))
    cells.join(broadcast(rows), "l_returnflag")
      .join(broadcast(cols), "l_linestatus")
      .crossJoin(broadcast(tot))
      .agg(
        first("n").as("n"),
        ((first("r") - 1) * (first("cc") - 1)).as("dof"),
        first("r").as("r"), first("cc").as("cc"),
        sum(expr(chi2CellSql)).as("chi2_raw"))
      .select(col("n"), col("dof"),
        r4(col("chi2_raw")).as("chi2"),
        r4(expr(
          "sqrt(chi2_raw / (CAST(n AS DOUBLE) * least(r - 1, cc - 1)))"))
          .as("v"))
  }

  private val chi2ExpSql = "(CAST(rtot AS DOUBLE) * ctot / n)"
  private val chi2CellSql =
    s"((CAST(c AS DOUBLE) - $chi2ExpSql) * (CAST(c AS DOUBLE) - $chi2ExpSql) / $chi2ExpSql)"

  // ---- M78: mutual information ----

  /** M78: MUTUAL INFORMATION between o_orderpriority and o_orderstatus
    * — MI, the two marginal entropies, and the symmetric normalization
    * MI/sqrt(H(X)·H(Y)) (the feature-redundancy screen run before
    * training on categorical features). Identical plan skeleton to m77:
    * one fact scan to cells, margin re-aggs, closed-form on exact
    * counts. The per-cell ln() runs on identical doubles both sides
    * (exact-integer ratios), so 1-ulp libm noise is 12 orders below
    * the 1e-4 grid. */
  val m78MutualInfo: Q = (s, d) => {
    val cells = orders(s, d)
      .groupBy("o_orderpriority", "o_orderstatus").agg(count(lit(1)).as("c"))
    val rows = cells.groupBy("o_orderpriority").agg(sum("c").as("rtot"))
    val cols = cells.groupBy("o_orderstatus").agg(sum("c").as("ctot"))
    val tot = cells.agg(sum("c").as("n"))
    val hx = rows.crossJoin(broadcast(tot))
      .agg(sum(expr(entTermSql("rtot"))).as("hx_raw"))
    val hy = cols.crossJoin(broadcast(tot))
      .agg(sum(expr(entTermSql("ctot"))).as("hy_raw"))
    cells.join(broadcast(rows), "o_orderpriority")
      .join(broadcast(cols), "o_orderstatus")
      .crossJoin(broadcast(tot))
      .agg(first("n").as("n"), sum(expr(miTermSql)).as("mi_raw"))
      .crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(col("n"),
        r4(col("mi_raw")).as("mi"),
        r4(col("hx_raw")).as("hx"),
        r4(col("hy_raw")).as("hy"),
        r4(expr("mi_raw / sqrt(hx_raw * hy_raw)")).as("nmi"))
  }

  private val miTermSql =
    "((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) * n / (CAST(rtot AS DOUBLE) * ctot)))"
  private def entTermSql(m: String) =
    s"(-(CAST($m AS DOUBLE) / n) * ln(CAST($m AS DOUBLE) / n))"

  // ---- A34: skewness / kurtosis ----

  /** A34: SKEWNESS + EXCESS KURTOSIS per return flag over l_quantity,
    * from exact raw-moment sums. Built-in `skewness`/`kurtosis` differ
    * in bias convention between engines, so the operator aggregates
    * the four integer power sums (exact in BIGINT — q⁴ ≤ 6.25e6, far
    * under 2⁶³ even at 10¹² rows) and applies ONE shared closed-form
    * text. Map-side combinable sums: the 100 TB plan is a single
    * partial-agg pass. */
  val a34SkewKurt: Q = (s, d) =>
    lineitem(s, d)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("q"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("q").as("s1"),
        sum(expr("q * q")).as("s2"),
        sum(expr("q * q * q")).as("s3"),
        sum(expr("q * q * q * q")).as("s4"))
      .select(col("l_returnflag"), col("n"),
        r4(expr(momMeanSql)).as("mean"),
        r4(expr(momM2Sql)).as("m2"),
        r4(expr(momSkewSql)).as("skew"),
        r4(expr(momKurtSql)).as("kurt"))
      .orderBy("l_returnflag")

  private val momMeanSql = "(CAST(s1 AS DOUBLE) / n)"
  private val momM2Sql =
    s"(CAST(s2 AS DOUBLE) / n - $momMeanSql * $momMeanSql)"
  private val momM3Sql =
    s"(CAST(s3 AS DOUBLE) / n - 3.0 * $momMeanSql * (CAST(s2 AS DOUBLE) / n) + 2.0 * $momMeanSql * $momMeanSql * $momMeanSql)"
  private val momM4Sql =
    s"(CAST(s4 AS DOUBLE) / n - 4.0 * $momMeanSql * (CAST(s3 AS DOUBLE) / n) + 6.0 * $momMeanSql * $momMeanSql * (CAST(s2 AS DOUBLE) / n) - 3.0 * $momMeanSql * $momMeanSql * $momMeanSql * $momMeanSql)"
  private val momSkewSql = s"($momM3Sql / pow($momM2Sql, 1.5))"
  private val momKurtSql = s"($momM4Sql / ($momM2Sql * $momM2Sql) - 3.0)"

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "q41_rfm" -> q41Rfm,
    "m76_cohen_kappa" -> m76CohenKappa,
    "m77_cramers_v" -> m77CramersV,
    "m78_mutual_info" -> m78MutualInfo,
    "a34_skew_kurt" -> a34SkewKurt)

  val oracleSql: Map[String, String] = Map(
    "q41_rfm" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
        |         DATE '1998-12-31') AS BIGINT) AS rec,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS mon
        |  FROM orders GROUP BY o_custkey),
        |bp AS (
        |  SELECT
        |    quantile_cont(rec, 0.25) AS r1, quantile_cont(rec, 0.50) AS r2,
        |    quantile_cont(rec, 0.75) AS r3,
        |    quantile_cont(freq, 0.25) AS f1, quantile_cont(freq, 0.50) AS f2,
        |    quantile_cont(freq, 0.75) AS f3,
        |    quantile_cont(mon, 0.25) AS m1, quantile_cont(mon, 0.50) AS m2,
        |    quantile_cont(mon, 0.75) AS m3
        |  FROM cust)
        |SELECT
        |  1 + CASE WHEN rec > r1 THEN 1 ELSE 0 END
        |    + CASE WHEN rec > r2 THEN 1 ELSE 0 END
        |    + CASE WHEN rec > r3 THEN 1 ELSE 0 END AS rseg,
        |  1 + CASE WHEN freq > f1 THEN 1 ELSE 0 END
        |    + CASE WHEN freq > f2 THEN 1 ELSE 0 END
        |    + CASE WHEN freq > f3 THEN 1 ELSE 0 END AS fseg,
        |  1 + CASE WHEN mon > m1 THEN 1 ELSE 0 END
        |    + CASE WHEN mon > m2 THEN 1 ELSE 0 END
        |    + CASE WHEN mon > m3 THEN 1 ELSE 0 END AS mseg,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  round(CAST(sum(mon) AS DOUBLE) / (100.0 * count(*)), 4) AS avg_monetary
        |FROM cust, bp
        |GROUP BY rseg, fseg, mseg
        |ORDER BY rseg, fseg, mseg""".stripMargin,
    "m76_cohen_kappa" ->
      s"""WITH a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 END) AS BIGINT) AS na_hi,
        |    CAST(count(CASE WHEN o_totalprice > 150000.0 THEN 1 END)
        |      AS BIGINT) AS nb_hi,
        |    CAST(count(CASE WHEN (o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |      = (o_totalprice > 150000.0) THEN 1 END) AS BIGINT) AS agree
        |  FROM orders)
        |SELECT n, na_hi, nb_hi, agree,
        |  round($kappaPoSql, 4) AS po,
        |  round($kappaPeSql, 4) AS pe,
        |  round($kappaSql, 4) AS kappa
        |FROM a""".stripMargin,
    "m77_cramers_v" ->
      s"""WITH cells AS (
        |  SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |rows_m AS (SELECT l_returnflag, CAST(sum(c) AS BIGINT) AS rtot
        |           FROM cells GROUP BY 1),
        |cols_m AS (SELECT l_linestatus, CAST(sum(c) AS BIGINT) AS ctot
        |           FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(DISTINCT l_returnflag) AS BIGINT) AS r,
        |    CAST(count(DISTINCT l_linestatus) AS BIGINT) AS cc FROM cells),
        |agg AS (
        |  SELECT any_value(n) AS n, (any_value(r) - 1) * (any_value(cc) - 1) AS dof,
        |    any_value(r) AS r, any_value(cc) AS cc,
        |    sum($chi2CellSql) AS chi2_raw
        |  FROM cells
        |  JOIN rows_m USING (l_returnflag)
        |  JOIN cols_m USING (l_linestatus)
        |  CROSS JOIN tot)
        |SELECT n, CAST(dof AS BIGINT) AS dof, round(chi2_raw, 4) AS chi2,
        |  round(sqrt(chi2_raw / (CAST(n AS DOUBLE) * least(r - 1, cc - 1))), 4) AS v
        |FROM agg""".stripMargin,
    "m78_mutual_info" ->
      s"""WITH cells AS (
        |  SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1, 2),
        |rows_m AS (SELECT o_orderpriority, CAST(sum(c) AS BIGINT) AS rtot
        |           FROM cells GROUP BY 1),
        |cols_m AS (SELECT o_orderstatus, CAST(sum(c) AS BIGINT) AS ctot
        |           FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
        |hx AS (SELECT sum(${entTermSql("rtot")}) AS hx_raw
        |       FROM rows_m CROSS JOIN tot),
        |hy AS (SELECT sum(${entTermSql("ctot")}) AS hy_raw
        |       FROM cols_m CROSS JOIN tot),
        |mi AS (
        |  SELECT any_value(n) AS n, sum($miTermSql) AS mi_raw
        |  FROM cells
        |  JOIN rows_m USING (o_orderpriority)
        |  JOIN cols_m USING (o_orderstatus)
        |  CROSS JOIN tot)
        |SELECT n, round(mi_raw, 4) AS mi, round(hx_raw, 4) AS hx,
        |  round(hy_raw, 4) AS hy,
        |  round(mi_raw / sqrt(hx_raw * hy_raw), 4) AS nmi
        |FROM mi CROSS JOIN hx CROSS JOIN hy""".stripMargin,
    "a34_skew_kurt" ->
      s"""WITH sums AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(q) AS BIGINT) AS s1,
        |    CAST(sum(q * q) AS BIGINT) AS s2,
        |    CAST(sum(q * q * q) AS BIGINT) AS s3,
        |    CAST(sum(q * q * q * q) AS BIGINT) AS s4
        |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
        |        FROM lineitem)
        |  GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round($momMeanSql, 4) AS mean,
        |  round($momM2Sql, 4) AS m2,
        |  round($momSkewSql, 4) AS skew,
        |  round($momKurtSql, 4) AS kurt
        |FROM sums ORDER BY l_returnflag""".stripMargin)
}
