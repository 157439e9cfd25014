package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-12 surface batch 4: closing two EVALUATION gaps —
  *
  *  - lt81 FORECAST BACKTEST: the registry grows forecasters (t15
  *    EWMA, lt17 Holt, lt69 Holt–Winters, lt77 Theta) but nothing that
  *    EVALUATES one; lt81 is the standard M-competition harness — hold
  *    out the last 3 days, forecast them seasonal-naively, score with
  *    MASE (scaled to the in-sample naive walk, Hyndman & Koehler
  *    2006) and sMAPE. m8/m32 evaluate classifiers; this is the
  *    time-series counterpart.
  *  - m210 CONFORMAL INTERVALS: m33 calibrates CLASSIFIER scores; no
  *    operator produces distribution-free REGRESSION intervals. m210
  *    is split conformal prediction (Vovk; Lei et al. 2018): OLS fit
  *    on a train split, the ⌈(n+1)(1−α)⌉-th smallest absolute
  *    calibration residual becomes the half-width, coverage audited on
  *    a disjoint test split. The finite-sample order statistic is
  *    EXACT — found at scale with [[graft.operators.PrefixSum]] over
  *    per-value residual counts, not a global sort.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 (time series; evaluation).
  */
object SurfaceR12d extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** The lt77/lt78 daily-mean discipline: per-row values quantized to
    * the 1e-6 grid BEFORE the mean, daily value = rounded integer. */
  private def dailyQv(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(floor(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))" +
        " AS DOUBLE) / count(*) + 0.5) AS BIGINT)").as("qv"))

  /** LT81: SEASONAL-NAIVE BACKTEST with MASE + sMAPE per event type.
    * Split: last 3 days held out; forecast x̂_j = qv_{j−7} (the weekly
    * seasonal naive — horizons 1..3 stay inside the train window);
    * MASE = (Σ|err|/3) / (Σ|Δtrain|/(n−4)) as ONE exact-integer ratio
    * (= Σerr·(n−4) / (3·ΣΔ), a single division); sMAPE terms
    * 200·|a−f|/(|a|+|f|) are per-row exact divisions quantized to the
    * 1e-6 grid before the 3-row sum (engine-order-proof).
    *
    * Scale shape: per-type lag windows over the calendar-bounded daily
    * table + two equi-joins on (type, day ordinal); the corpus-scaled
    * pass is the daily pre-agg, as in lt69/lt77/lt78. */
  val lt81MaseBacktest: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("day")
    val idx = dailyQv(s, d)
      .withColumn("j", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .where(col("n") >= 12)
    val trainDiff = idx.where(col("j") <= col("n") - 3)
      .withColumn("prev", lag("qv", 1).over(w))
      .where(col("prev").isNotNull)
      .groupBy("event_type")
      .agg(sum(abs(col("qv") - col("prev"))).as("sum_diff"),
        count(lit(1)).as("n_diff"))
    val season = idx.select(col("event_type"), (col("j") + 7).as("j"),
      col("qv").as("f"))
    val test = idx.where(col("j") > col("n") - 3)
      .join(season, Seq("event_type", "j"))
      .select(col("event_type"), col("n"),
        abs(col("qv") - col("f")).as("aerr"),
        expr("CAST(floor(CAST(200 * abs(qv - f) AS DOUBLE)" +
          " / (abs(qv) + abs(f)) * 1000000 + 0.5) AS BIGINT)").as("qsmape"))
      .groupBy("event_type", "n")
      .agg(sum("aerr").as("sum_err"), sum("qsmape").as("sum_qs"),
        count(lit(1)).as("h"))
    test.join(trainDiff, "event_type")
      .select(col("event_type"), col("n").as("n_days"),
        r4(expr("CAST(sum_err * n_diff AS DOUBLE) / CAST(h * sum_diff AS DOUBLE)"))
          .as("mase"),
        r4(expr("CAST(sum_qs AS DOUBLE) / (1000000.0 * h)")).as("smape"))
      .orderBy("event_type")
  }

  /** M210: SPLIT CONFORMAL PREDICTION INTERVALS, α = 0.1, over the
    * lineitem price-vs-quantity relation. Splits by orderkey: train
    * ≡ 0 (mod 2), calibration ≡ 1 (mod 4), test ≡ 3 (mod 4) —
    * disjoint, deterministic, hash-free.
    *
    * Exactness ledger (§5.3): y quantized to the 1e-2 grid, x is
    * integral by fixture; OLS moments are exact BIGINT sums; the
    * slope's (nΣxy − ΣxΣy)/(nΣxx − Σx²) runs in 128-bit integers
    * (Spark DECIMAL(38,0) / DuckDB HUGEINT — BIGINT products overflow
    * past sf0.1, and the double form risks the §5.3 FMA contraction)
    * with ONE final double division; slope and intercept are then
    * re-quantized to 1e-4 sub-grids so every residual
    * r = 10000·y₂ − (qa + qb·x) is an EXACT INTEGER. The conformal
    * half-width is the k = ⌈(n_cal+1)·0.9⌉-th smallest |r| — an exact
    * order statistic, not an interpolated percentile.
    *
    * Scale shape: the order statistic is found by hash-agg per distinct
    * |r| value + [[graft.operators.PrefixSum]] cumulative counts (the
    * m46/a30 pattern) — no global single-partition sort at any size;
    * everything else is scans, one broadcast param row, hash aggs. */
  val m210ConformalOls: Q = (s, d) => {
    val base = lineitem(s, d).select(
      col("l_orderkey"), col("l_returnflag"),
      col("l_quantity").cast("long").as("x"),
      expr("CAST(floor(l_extendedprice * 1e2 + 5e-1) AS BIGINT)").as("y2"))
    val train = base.where(col("l_orderkey") % 2 === 0)
    val mom = train.agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y2").as("sy"),
      sum(col("x") * col("y2")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    // 128-bit exact numerator/denominator, one double division, then
    // fixed-point slope/intercept (qb on the 1e-4 grid of y2-units per
    // unit x; qa on the 1e-4 grid of y2-units)
    val params = mom.select(
      expr("""CAST(CAST(CAST(n AS DECIMAL(38,0)) * CAST(sxy AS DECIMAL(38,0))
           - CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0)) AS DOUBLE)
           / CAST(CAST(n AS DECIMAL(38,0)) * CAST(sxx AS DECIMAL(38,0))
           - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) AS DOUBLE)
           AS DOUBLE)""").as("b"),
      col("sy"), col("sx"), col("n"))
      .select(expr("CAST(floor(b * 10000 + 0.5) AS BIGINT)").as("qb"),
        col("sy"), col("sx"), col("n"))
      .select(col("qb"),
        expr("""CAST(floor(CAST(sy * 10000 - qb * sx AS DOUBLE) / n + 0.5)
             AS BIGINT)""").as("qa"))
    val withR = base.crossJoin(broadcast(params))
      .withColumn("r", abs(col("y2") * 10000L - (col("qa") + col("qb") * col("x"))))
    val calib = withR.where(col("l_orderkey") % 4 === 1)
    val kRow = calib.agg(count(lit(1)).as("ncal"))
      .select((((col("ncal") + 1) * 9 + 9) / 10).cast("long").as("k"))
    // exact order statistic via per-value counts + distributed prefix sum
    val byVal = calib.groupBy(col("r").as("rv")).agg(count(lit(1)).as("cnt"))
    val cum = graft.operators.PrefixSum.withRunningTotal(
      byVal, Seq("rv"), "cnt", outCol = "cum")
    val qconf = cum.crossJoin(broadcast(kRow))
      .where(col("cum") >= col("k"))
      .agg(min("rv").as("qr"))
    withR.where(col("l_orderkey") % 4 === 3)
      .crossJoin(broadcast(qconf))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("r") <= col("qr"), 1L).otherwise(0L)).as("n_covered"),
        max(col("qr")).as("qr"))
      .select(col("l_returnflag"), col("n_test"),
        r4(expr("CAST(n_covered AS DOUBLE) / n_test")).as("coverage"),
        r4(expr("CAST(2 * qr AS DOUBLE) / 1000000.0")).as("width"))
      .orderBy("l_returnflag")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt81_mase_backtest" -> lt81MaseBacktest,
    "m210_conformal_ols" -> m210ConformalOls)

  val oracleSql: Map[String, String] = Map(
    "lt81_mase_backtest" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    CAST(floor(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
        |      AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS qv
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, qv,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS j,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM daily QUALIFY n >= 12),
        |td AS (
        |  SELECT event_type,
        |    CAST(sum(abs(qv - prev)) AS BIGINT) AS sum_diff,
        |    CAST(count(*) AS BIGINT) AS n_diff
        |  FROM (SELECT event_type, qv,
        |          lag(qv, 1) OVER (PARTITION BY event_type ORDER BY j) AS prev
        |        FROM idx WHERE j <= n - 3)
        |  WHERE prev IS NOT NULL GROUP BY 1),
        |tst AS (
        |  SELECT t.event_type, t.n,
        |    CAST(sum(abs(t.qv - f.qv)) AS BIGINT) AS sum_err,
        |    CAST(sum(CAST(floor(CAST(200 * abs(t.qv - f.qv) AS DOUBLE)
        |      / (abs(t.qv) + abs(f.qv)) * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS sum_qs,
        |    CAST(count(*) AS BIGINT) AS h
        |  FROM idx t JOIN idx f
        |    ON f.event_type = t.event_type AND f.j = t.j - 7
        |  WHERE t.j > t.n - 3 GROUP BY 1, 2)
        |SELECT t.event_type, t.n AS n_days,
        |  round(CAST(sum_err * n_diff AS DOUBLE)
        |    / CAST(h * sum_diff AS DOUBLE), 4) AS mase,
        |  round(CAST(sum_qs AS DOUBLE) / (1000000.0 * h), 4) AS smape
        |FROM tst t JOIN td USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "m210_conformal_ols" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice * 1e2 + 5e-1) AS BIGINT) AS y2
        |  FROM lineitem),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y2) AS BIGINT) AS sy,
        |    CAST(sum(x * y2) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM base WHERE l_orderkey % 2 = 0),
        |params AS (
        |  SELECT qb,
        |    CAST(floor(CAST(sy * 10000 - qb * sx AS DOUBLE) / n + 0.5)
        |      AS BIGINT) AS qa
        |  FROM (SELECT
        |    CAST(floor(CAST(CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
        |        - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
        |        - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE)
        |      * 10000 + 0.5) AS BIGINT) AS qb,
        |    sy, sx, n FROM mom)),
        |wr AS (
        |  SELECT b.l_orderkey, b.l_returnflag,
        |    abs(b.y2 * 10000 - (p.qa + p.qb * b.x)) AS r
        |  FROM base b CROSS JOIN params p),
        |krow AS (
        |  SELECT CAST(((count(*) + 1) * 9 + 9) // 10 AS BIGINT) AS k
        |  FROM wr WHERE l_orderkey % 4 = 1),
        |cum AS (
        |  SELECT rv, sum(cnt) OVER (ORDER BY rv) AS cum
        |  FROM (SELECT r AS rv, count(*) AS cnt
        |        FROM wr WHERE l_orderkey % 4 = 1 GROUP BY 1)),
        |qconf AS (
        |  SELECT CAST(min(rv) AS BIGINT) AS qr
        |  FROM cum CROSS JOIN krow WHERE cum >= k)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_test,
        |  round(CAST(sum(CASE WHEN r <= qr THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 4) AS coverage,
        |  round(CAST(2 * min(qr) AS DOUBLE) / 1000000.0, 4) AS width
        |FROM wr CROSS JOIN qconf
        |WHERE l_orderkey % 4 = 3
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
