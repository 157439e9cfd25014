package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}

/** Round-11 surface batch 6: Cox proportional-hazards regression — the
  * semi-parametric survival model MLlib does not ship.
  *
  * Contrast with near-siblings: m69 AFT assumes a parametric (Weibull)
  * baseline and models log-time; m71/m73 estimate curves with NO
  * covariates; m75 log-rank TESTS a group difference; m114 scores
  * concordance. Cox is the missing center of that toolkit: a hazard
  * RATIO per covariate unit with the baseline left free — the default
  * model of applied survival analysis.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.13 (survival family). Method: Cox 1972 partial
  * likelihood with Breslow tie handling; Newton–Raphson from β=0.
  */
object SurfaceR11f extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val NEWTON_ROUNDS = 3

  /** M204: COX PROPORTIONAL HAZARDS (1 covariate, Breslow ties) —
    * duration = days from order date to the administrative censor date
    * (m71's convention), event = order finalized, covariate x =
    * o_totalprice/1e5. Three Newton–Raphson rounds on the partial
    * log-likelihood: U(β) = Σ_t [Σ_{ev at t} x − d_t·S1/S0],
    * I(β) = Σ_t d_t·[S2/S0 − (S1/S0)²], β ← β + U/I, where S_k(t) =
    * Σ_{risk set ≥ t} x^k·exp(βx).
    *
    * Determinism: every sum that crosses rows goes through exact
    * integers — exp(βx)·x^k is quantized to the 1e-6 grid per ROW
    * before any aggregation, per-event-time score/info terms are
    * quantized before the across-time sum, and β itself is re-quantized
    * each round (the m183 IRLS discipline; the 1e-6 grid keeps the
    * worst-case libm-exp ulp disagreement ~9 orders of magnitude below
    * a grid step). The DuckDB oracle replays the identical 3 unrolled
    * rounds. Scale shape: risk-set sums are ONE hash agg per distinct
    * duration day (calendar-bounded) + a reverse cumulative window over
    * those days (Windows.bounded); the per-row exp pass is a narrow
    * projection under a broadcast 1-row β. Output: (round, β, U, I) —
    * convergence is visible in the rows. */
  val m204CoxPh: Q = (s, d) => {
    val base = orders(s, d).select(
      datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
        .cast("long").as("dur"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("ev"),
      (col("o_totalprice") / 100000.0d).as("x"))
      .localCheckpoint(true)
    var beta = s.range(1).select(lit(0.0d).as("beta"))
    var out: DataFrame = null
    for (r <- 1 to NEWTON_ROUNDS) {
      val ex = base.crossJoin(broadcast(beta.select("beta"))).select(
        col("dur"), col("ev"), col("x"),
        expr("CAST(floor(exp(beta * x) * 1000000 + 0.5) AS BIGINT)").as("qe"),
        expr("CAST(floor(x * exp(beta * x) * 1000000 + 0.5) AS BIGINT)").as("qxe"),
        expr("CAST(floor(x * x * exp(beta * x) * 1000000 + 0.5) AS BIGINT)").as("qx2e"))
      val pd = ex.groupBy("dur").agg(
        sum(when(col("ev") === 1, 1L).otherwise(0L)).as("d"),
        sum(when(col("ev") === 1,
          expr("CAST(floor(x * 1000000 + 0.5) AS BIGINT)")).otherwise(0L)).as("qsx"),
        sum("qe").as("se"), sum("qxe").as("sxe"), sum("qx2e").as("sx2e"))
      val w = Windows.bounded(col("dur").desc)
      val rs = pd.select(col("dur"), col("d"), col("qsx"),
        sum("se").over(w).as("s0"),
        sum("sxe").over(w).as("s1"),
        sum("sx2e").over(w).as("s2"))
      val ui = rs.where(col("d") > 0).agg(
        sum(expr("CAST(floor((CAST(qsx AS DOUBLE) / 1000000" +
          " - d * (CAST(s1 AS DOUBLE) / s0)) * 1000000 + 0.5) AS BIGINT)"))
          .as("qu"),
        sum(expr("CAST(floor(d * (CAST(s2 AS DOUBLE) / s0" +
          " - (CAST(s1 AS DOUBLE) / s0) * (CAST(s1 AS DOUBLE) / s0))" +
          " * 1000000 + 0.5) AS BIGINT)")).as("qi"))
      beta = ui.crossJoin(broadcast(beta.select(col("beta").as("b0"))))
        .select(
          expr("floor((b0 + (CAST(qu AS DOUBLE) / 1000000)" +
            " / (CAST(qi AS DOUBLE) / 1000000)) * 1000000 + 0.5) / 1000000")
            .as("beta"),
          expr("CAST(qu AS DOUBLE) / 1000000").as("u"),
          expr("CAST(qi AS DOUBLE) / 1000000").as("info"))
        .localCheckpoint(true)
      val round = beta.select(lit(r.toLong).as("round"), r4(col("beta")).as("beta"),
        r4(col("u")).as("score_u"), r4(col("info")).as("info"))
      out = if (out == null) round else out.unionByName(round)
    }
    out.orderBy("round")
  }

  /** One unrolled Newton round of the oracle (identical arithmetic
    * text; b$i is the incoming quantized-β CTE, b${i+1} the outgoing). */
  private def coxRoundSql(i: Int): String =
    s"""ex$i AS (
       |  SELECT dur, ev, x,
       |    CAST(floor(exp(b$i.beta * x) * 1000000 + 0.5) AS BIGINT) AS qe,
       |    CAST(floor(x * exp(b$i.beta * x) * 1000000 + 0.5) AS BIGINT) AS qxe,
       |    CAST(floor(x * x * exp(b$i.beta * x) * 1000000 + 0.5) AS BIGINT) AS qx2e
       |  FROM base CROSS JOIN b$i),
       |pd$i AS MATERIALIZED (
       |  SELECT dur,
       |    CAST(sum(CASE WHEN ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d,
       |    sum(CASE WHEN ev = 1
       |        THEN CAST(floor(x * 1000000 + 0.5) AS BIGINT)
       |        ELSE CAST(0 AS BIGINT) END) AS qsx,
       |    sum(qe) AS se, sum(qxe) AS sxe, sum(qx2e) AS sx2e
       |  FROM ex$i GROUP BY dur),
       |rs$i AS (
       |  SELECT dur, d, qsx,
       |    sum(se)  OVER (ORDER BY dur DESC) AS s0,
       |    sum(sxe) OVER (ORDER BY dur DESC) AS s1,
       |    sum(sx2e) OVER (ORDER BY dur DESC) AS s2
       |  FROM pd$i),
       |ui$i AS (
       |  SELECT
       |    sum(CAST(floor((CAST(qsx AS DOUBLE) / 1000000
       |        - d * (CAST(s1 AS DOUBLE) / s0)) * 1000000 + 0.5) AS BIGINT)) AS qu,
       |    sum(CAST(floor(d * (CAST(s2 AS DOUBLE) / s0
       |        - (CAST(s1 AS DOUBLE) / s0) * (CAST(s1 AS DOUBLE) / s0))
       |        * 1000000 + 0.5) AS BIGINT)) AS qi
       |  FROM rs$i WHERE d > 0),
       |b${i + 1} AS MATERIALIZED (
       |  SELECT floor((b$i.beta + (CAST(qu AS DOUBLE) / 1000000)
       |      / (CAST(qi AS DOUBLE) / 1000000)) * 1000000 + 0.5) / 1000000 AS beta,
       |    CAST(qu AS DOUBLE) / 1000000 AS u, CAST(qi AS DOUBLE) / 1000000 AS info
       |  FROM ui$i CROSS JOIN b$i)""".stripMargin

  private def coxSql: String = {
    val rounds = (0 until NEWTON_ROUNDS).map(coxRoundSql).mkString(",\n")
    val readout = (1 to NEWTON_ROUNDS).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, round(b$r.beta, 4) AS beta," +
        s" round(b$r.u, 4) AS score_u, round(b$r.info, 4) AS info FROM b$r"
    }.mkString("\nUNION ALL ")
    s"""WITH base AS MATERIALIZED (
       |  SELECT CAST(datediff('day', CAST(o_orderdate AS DATE),
       |           DATE '1998-12-31') AS BIGINT) AS dur,
       |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev,
       |    o_totalprice / 100000.0 AS x
       |  FROM orders),
       |b0 AS (SELECT CAST(0.0 AS DOUBLE) AS beta),
       |$rounds
       |$readout
       |ORDER BY round""".stripMargin
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m204_cox_ph" -> m204CoxPh)

  val oracleSql: Map[String, String] = Map(
    "m204_cox_ph" -> coxSql)
}
