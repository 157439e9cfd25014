package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 64: corpus contrast + reliability — the
  * MONROE log-odds-ratio with informative Dirichlet prior ("Fightin'
  * Words"). lt33 already ranks per-source terms by +0.5-smoothed raw
  * log-odds; Monroe's method differs twice — the prior is INFORMATIVE
  * (proportional to corpus rates, not flat) and the ranking is by the
  * VARIANCE-normalized z, which stops rare terms from dominating the
  * way raw log-odds lets them. Plus
  * the one-way intraclass correlation ICC(1,1) on a balanced design
  * (how much of daily order-volume variance is BETWEEN weeks vs
  * within them — the reliability number behind "is a week a coherent
  * unit?"). Monroe z-scores come from exact integer term counts
  * through one shared formula; ICC reduces to four exact integer sums
  * over complete (7-day) weeks, so both are bit-deterministic.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.9 (text analysis), §2.13 (statistics).
  */
object SurfaceR10bl extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LT44: Monroe log-odds ----

  // a0 = 100 total prior tokens, split proportionally to corpus rates.
  // Literals in e-notation: Spark parses `100.0` as DECIMAL and the
  // decimal division would round the prior before ln sees it (the
  // §16.6 float-discipline finding); `100e0` is DOUBLE on both engines.
  private val loAw = "(100e0 * (ca + cb) / (na + nb))"
  private val loDelta =
    s"(ln((ca + $loAw) / (na + 100e0 - ca - $loAw)) - ln((cb + $loAw) / (nb + 100e0 - cb - $loAw)))"
  private val loZ =
    s"($loDelta / sqrt(1e0 / (ca + $loAw) + 1e0 / (cb + $loAw)))"

  /** LT44: MONROE LOG-ODDS — the ten terms most distinctive of the
    * English subcorpus vs the rest, by Dirichlet-shrunk log-odds
    * z-score. Per-term counts and subcorpus totals are exact
    * integers (two conditional sums in ONE vocab hash agg); δ, σ²,
    * and z are one shared closed form, so the ranking itself is
    * bit-deterministic. Min count 20 keeps the report to established
    * vocabulary. The plan is a corpus explode + hash agg + vocab-sized
    * top-k sort — nothing corpus-sized past the first agg. */
  val lt44MonroeLogOdds: Q = (s, d) => {
    val counts = documents(s, d)
      .select(when(col("lang") === "en", 1L).otherwise(0L).as("isa"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy("w")
      .agg(sum("isa").as("ca"),
        sum(lit(1L) - col("isa")).as("cb"))
    val tot = counts.agg(sum("ca").as("na"), sum("cb").as("nb"))
    counts
      .where(col("ca") + col("cb") >= 20)
      .crossJoin(broadcast(tot))
      .select(col("w"), col("ca"), col("cb"),
        r4(expr(loZ)).as("z"),
        expr(loZ).as("_zraw"))
      .orderBy(col("_zraw").desc, col("w"))
      .limit(10)
      .select(col("w"), col("ca"), col("cb"), col("z"))
  }

  // ---- M150: ICC(1,1) ----

  private val iccMsb = "((CAST(st2 AS DOUBLE) / 7.0 - CAST(g AS DOUBLE) * gg / n_obs) / (gw - 1))"
  private val iccMsw = "((CAST(sq AS DOUBLE) - CAST(st2 AS DOUBLE) / 7.0) / (n_obs - gw))"
  private val iccVal = s"(($iccMsb - $iccMsw) / ($iccMsb + 6.0 * $iccMsw))"

  /** M150: ICC(1,1) — one-way random-effects intraclass correlation
    * of daily order counts within complete 7-day weeks (balanced
    * design, k = 7). From exact integers only: Σy², per-week sums
    * T_i, ΣT_i², grand total — MSB, MSW, and ICC are shared closed
    * forms. ICC→1 means weeks differ far more than days within a
    * week (seasonality); →0 means weeks are arbitrary groupings. */
  val m150Icc: Q = (s, d) => {
    val daily = orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .withColumn("wk", expr("CAST(floor(t / 7.0) AS BIGINT)"))
    val weeks = daily.groupBy("wk")
      .agg(count(lit(1)).as("nd"), sum("y").as("ti"),
        sum(col("y") * col("y")).as("sqi"))
      .where(col("nd") === 7)
    weeks.agg(
      count(lit(1)).as("gw"),
      sum("ti").as("g"),
      sum(col("ti") * col("ti")).as("st2"),
      sum("sqi").as("sq"))
      .select(col("gw").as("n_weeks"),
        (col("gw") * 7L).as("n_days"),
        r4(expr(s"${iccMsb.replace("n_obs", "(gw * 7)").replace("gg", "g")}"))
          .as("msb"),
        r4(expr(s"${iccMsw.replace("n_obs", "(gw * 7)")}")).as("msw"),
        r4(expr(s"${iccVal.replace("n_obs", "(gw * 7)").replace("gg", "g")}"))
          .as("icc"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt44_monroe_log_odds" -> lt44MonroeLogOdds,
    "m150_icc" -> m150Icc)

  val oracleSql: Map[String, String] = Map(
    "lt44_monroe_log_odds" ->
      s"""WITH counts AS (
        |  SELECT tok AS w,
        |    CAST(sum(isa) AS BIGINT) AS ca,
        |    CAST(sum(1 - isa) AS BIGINT) AS cb
        |  FROM (
        |    SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS isa,
        |      unnest(string_split(text, ' ')) AS tok
        |    FROM documents) t
        |  GROUP BY tok),
        |tot AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM counts)
        |SELECT w, ca, cb, round($loZ, 4) AS z
        |FROM counts CROSS JOIN tot
        |WHERE ca + cb >= 20
        |ORDER BY $loZ DESC, w
        |LIMIT 10""".stripMargin,
    "m150_icc" -> {
      val nObs = "(gw * 7)"
      val msb = iccMsb.replace("n_obs", nObs).replace("gg", "g")
      val msw = iccMsw.replace("n_obs", nObs)
      val icc = iccVal.replace("n_obs", nObs).replace("gg", "g")
      s"""WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |weeks AS (
        |  SELECT CAST(floor(t / 7.0) AS BIGINT) AS wk,
        |    CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(y) AS BIGINT) AS ti,
        |    CAST(sum(y * y) AS BIGINT) AS sqi
        |  FROM daily GROUP BY 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS gw,
        |    CAST(sum(ti) AS BIGINT) AS g,
        |    CAST(sum(ti * ti) AS BIGINT) AS st2,
        |    CAST(sum(sqi) AS BIGINT) AS sq
        |  FROM weeks WHERE nd = 7)
        |SELECT gw AS n_weeks, CAST(gw * 7 AS BIGINT) AS n_days,
        |  round($msb, 4) AS msb,
        |  round($msw, 4) AS msw,
        |  round($icc, 4) AS icc
        |FROM agg""".stripMargin
    })
}
