package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 48: uncertainty quantification — split-
  * conformal prediction intervals (the distribution-free way to turn
  * ANY point forecaster into a calibrated interval: fit on train,
  * take the α-quantile of absolute residuals on a held-out
  * calibration split, audit coverage on test) and McFadden's
  * pseudo-R² (the "how much better than the base rate" number for
  * probabilistic classifiers, completing the m98 log-loss family).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (ML evaluation).
  */
object SurfaceR10av extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M133: split-conformal interval ----

  private val cfB =
    "((n_tr * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) / (n_tr * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))"
  private val cfA = s"((CAST(sy AS DOUBLE) - $cfB * sx) / n_tr)"
  private val cfResid = s"abs(CAST(y AS DOUBLE) - $cfA - $cfB * x)"

  /** M133: SPLIT-CONFORMAL — predict an order's total (whole dollars)
    * from its line count with train-split OLS (closed form over five
    * exact integer sums), set the interval half-width q̂ to the 0.9
    * interpolated quantile of |residual| on the calibration split
    * (convention stated: plain quantile, not the ⌈(n+1)α⌉ finite-
    * sample form — at these n the difference is < one order stat),
    * then AUDIT: the fraction of test rows inside ±q̂ must sit near
    * 90% — the guarantee conformal prediction makes with no
    * distributional assumptions at all. Splits are md5-pure (retry-
    * stable); residuals are deterministic doubles off exact integers;
    * the three split passes are conditional aggregates over ONE
    * joined scan — no iteration anywhere. */
  val m133Conformal: Q = (s, d) => {
    val nib =
      "(instr('0123456789abcdef', substr(md5(concat(o_orderkey, ':conf')), 1, 1)) - 1)"
    val lc = lineitem(s, d).groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("x"))
    val rows = orders(s, d)
      .select(col("o_orderkey"),
        expr("CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT)")
          .as("y"),
        expr(s"CASE WHEN $nib < 8 THEN 'tr' WHEN $nib < 12 THEN 'ca' ELSE 'te' END")
          .as("split"))
      .join(lc, "o_orderkey")
    val fit = rows.where(col("split") === "tr")
      .agg(count(lit(1)).as("n_tr"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
    val withResid = rows.crossJoin(broadcast(fit))
      .select(col("split"), expr(cfResid).as("r"))
    val qhat = withResid.where(col("split") === "ca")
      .agg(count(lit(1)).as("n_cal"),
        expr("percentile(r, 0.9)").as("qh"))
    withResid.where(col("split") === "te")
      .crossJoin(broadcast(qhat))
      .groupBy("n_cal", "qh")
      .agg(count(lit(1)).as("n_test"),
        sum(expr("CASE WHEN r <= qh THEN 1 ELSE 0 END")).as("n_in"))
      .crossJoin(broadcast(fit.select(col("n_tr"))))
      .select(col("n_tr"), col("n_cal"), col("n_test"),
        r4(col("qh")).as("qhat"),
        r4(expr("CAST(n_in AS DOUBLE) / n_test")).as("coverage"))
  }

  // ---- M136: McFadden pseudo-R² ----

  private val prP = "((s256 + 0.5) / 256.0)"
  private val prTerm =
    s"(CASE WHEN y = 1 THEN -ln($prP) ELSE -ln(1.0 - $prP) END)"
  private val prNull =
    "(-(CAST(npos AS DOUBLE) * ln(CAST(npos AS DOUBLE) / n) + (n - CAST(npos AS DOUBLE)) * ln(1.0 - CAST(npos AS DOUBLE) / n)))"

  /** M136: McFADDEN PSEUDO-R² — 1 − LL(model)/LL(null) over the m98
    * score construction (p = (s256+½)/256 from the md5 'cal' seed, so
    * the whole evaluator family m33/m98/m136 grades the SAME model).
    * LL(null) is a CLOSED FORM of (n, npos) — the null model predicts
    * the base rate for every row — so the only data pass is m98's
    * conditional aggregate. ~0 = no better than the base rate; 0.2–0.4
    * is "excellent" by McFadden's own calibration — the number that
    * contextualizes a raw log loss. */
  val m136PseudoR2: Q = (s, d) =>
    events(s, d).select(
      expr("""((instr('0123456789abcdef', substr(md5(event_id || 'cal'), 1, 1)) - 1) * 16 +
             | (instr('0123456789abcdef', substr(md5(event_id || 'cal'), 2, 1)) - 1))
             |""".stripMargin.replaceAll("\n", "")).as("s256"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .agg(count(lit(1)).as("n"), sum("y").as("npos"),
        sum(expr(prTerm)).as("ll_model_raw"))
      .select(col("n"), col("npos"),
        r4(expr("ll_model_raw / n")).as("ll_model_mean"),
        r4(expr(s"$prNull / n")).as("ll_null_mean"),
        r4(expr(s"1.0 - ll_model_raw / $prNull")).as("mcfadden_r2"))

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m133_conformal" -> m133Conformal,
    "m136_pseudo_r2" -> m136PseudoR2)

  val oracleSql: Map[String, String] = Map(
    "m133_conformal" -> {
      val nib =
        "(instr('0123456789abcdef', substr(md5(concat(o.o_orderkey, ':conf')), 1, 1)) - 1)"
      s"""WITH lc AS (
        |  SELECT l_orderkey AS o_orderkey, CAST(count(*) AS BIGINT) AS x
        |  FROM lineitem GROUP BY 1),
        |rows_ AS (
        |  SELECT o.o_orderkey,
        |    CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT) AS y,
        |    CASE WHEN $nib < 8 THEN 'tr' WHEN $nib < 12 THEN 'ca' ELSE 'te' END AS split,
        |    lc.x
        |  FROM orders o JOIN lc ON lc.o_orderkey = o.o_orderkey),
        |fit AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_tr, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM rows_ WHERE split = 'tr'),
        |resid AS (
        |  SELECT split, $cfResid AS r FROM rows_ CROSS JOIN fit),
        |cal AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_cal, quantile_cont(r, 0.9) AS qh
        |  FROM resid WHERE split = 'ca'),
        |te AS (
        |  SELECT n_cal, qh, CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(sum(CASE WHEN r <= qh THEN 1 ELSE 0 END) AS BIGINT) AS n_in
        |  FROM resid CROSS JOIN cal WHERE split = 'te'
        |  GROUP BY 1, 2)
        |SELECT n_tr, n_cal, n_test,
        |  round(qh, 4) AS qhat,
        |  round(CAST(n_in AS DOUBLE) / n_test, 4) AS coverage
        |FROM te CROSS JOIN (SELECT n_tr FROM fit) f""".stripMargin
    },
    "m136_pseudo_r2" ->
      s"""WITH e AS (
        |  SELECT ((instr('0123456789abcdef', substr(md5(event_id || 'cal'), 1, 1)) - 1) * 16 +
        |          (instr('0123456789abcdef', substr(md5(event_id || 'cal'), 2, 1)) - 1)) AS s256,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS npos,
        |    sum($prTerm) AS ll_model_raw
        |  FROM e)
        |SELECT n, npos,
        |  round(ll_model_raw / n, 4) AS ll_model_mean,
        |  round($prNull / n, 4) AS ll_null_mean,
        |  round(1.0 - ll_model_raw / $prNull, 4) AS mcfadden_r2
        |FROM agg""".stripMargin)
}
