package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 50: modern experiment analysis — CUPED
  * variance reduction (the pre-period-covariate adjustment every
  * large experimentation platform applies before reading a metric:
  * same estimate, tighter CI, shorter experiments) and a sign-flip
  * permutation test (the exact nonparametric significance test for
  * paired differences, made cluster-feasible by md5-deterministic
  * sign patterns instead of an actual shuffle).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (A/B analytics).
  */
object SurfaceR10ax extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M134: CUPED ----

  private val cuCov =
    "(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)"
  private val cuVarX =
    "(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)"
  private val cuVarY =
    "(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)"

  /** M134: CUPED — per customer, X = pre-1996 spend, Y = post-1996
    * spend (exact whole DOLLARS from conditional per-customer sums —
    * cents² power sums would overflow BIGINT at sf ≥ 0.01). The
    * adjusted metric Y − θ(X − X̄) with θ = cov(X,Y)/var(X) keeps the
    * same mean but sheds exactly corr² of the variance:
    * var(Yadj)/var(Y) = 1 − ρ²(X,Y) — a closed form over five exact
    * integer sums, which is why CUPED costs ONE aggregate pass at any
    * scale. Reported: θ, ρ, and the variance-reduction fraction (the
    * number that translates directly into saved experiment days). */
  val m134Cuped: Q = (s, d) => {
    val perCust = orders(s, d)
      .select(col("o_custkey"),
        expr("CASE WHEN o_orderdate < DATE '1996-01-01' THEN CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT) ELSE 0 END")
          .as("xc"),
        expr("CASE WHEN o_orderdate >= DATE '1996-01-01' THEN CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT) ELSE 0 END")
          .as("yc"))
      .groupBy("o_custkey")
      .agg(sum("xc").as("x"), sum("yc").as("y"))
    perCust
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"),
        sum(expr("x * y")).as("sxy"))
      .select(col("n"),
        r4(expr(s"$cuCov / $cuVarX")).as("theta"),
        r4(expr(s"$cuCov / sqrt($cuVarX * $cuVarY)")).as("corr_xy"),
        r4(expr(s"($cuCov * $cuCov) / ($cuVarX * $cuVarY)"))
          .as("var_reduction"))
  }

  // ---- M135: sign-flip permutation test ----

  /** M135: SIGN-FLIP TEST — for customers active in BOTH eras, the
    * paired difference d = mean(post) − mean(pre) (quantized to exact
    * integer centi-cents, so every sum below is integer-exact). Under
    * H0 the sign of each d is exchangeable, so B=32 md5-deterministic
    * ±1 patterns give an exact permutation null for T = Σd:
    * p = (1 + #{|T_b| ≥ |T|}) / (B+1). No data shuffle, no RNG state —
    * the replicate axis is a 32-way explode with pure-hash signs (the
    * lp55 design), which is what makes a permutation test runnable on
    * a cluster at all. */
  val m135SignflipTest: Q = (s, d) => {
    val pairs = orders(s, d)
      .select(col("o_custkey"),
        expr("CASE WHEN o_orderdate < DATE '1996-01-01' THEN 1 ELSE 0 END").as("pre"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("o_custkey")
      .agg(sum(expr("CASE WHEN pre = 1 THEN 1 ELSE 0 END")).as("n_pre"),
        sum(expr("CASE WHEN pre = 0 THEN 1 ELSE 0 END")).as("n_post"),
        sum(expr("CASE WHEN pre = 1 THEN c ELSE 0 END")).as("s_pre"),
        sum(expr("CASE WHEN pre = 0 THEN c ELSE 0 END")).as("s_post"))
      .where(col("n_pre") > 0 && col("n_post") > 0)
      .select(col("o_custkey"),
        expr("CAST(floor((CAST(s_post AS DOUBLE) / n_post - CAST(s_pre AS DOUBLE) / n_pre) * 100 + 0.5) AS BIGINT)")
          .as("dq"))
    val obs = pairs.agg(count(lit(1)).as("n_pairs"), sum("dq").as("t_obs"))
    val reps = pairs
      .select(col("o_custkey"), col("dq"),
        explode(expr("sequence(1, 32)")).as("b"))
      .select(col("b"),
        expr("CASE WHEN (instr('0123456789abcdef', substr(md5(concat(o_custkey, ':', b, ':flip')), 1, 1)) - 1) < 8 THEN dq ELSE -dq END")
          .as("sd"))
      .groupBy("b").agg(sum("sd").as("tb"))
    reps.crossJoin(broadcast(obs))
      .agg(max(col("n_pairs")).as("n_pairs"), max(col("t_obs")).as("t_obs_q"),
        sum(expr("CASE WHEN abs(tb) >= abs(t_obs) THEN 1 ELSE 0 END"))
          .as("n_extreme"))
      .select(col("n_pairs"),
        r4(expr("CAST(t_obs_q AS DOUBLE) / (100.0 * 100.0 * n_pairs)"))
          .as("mean_diff_dollars"),
        col("n_extreme"),
        r4(expr("(1.0 + n_extreme) / 33.0")).as("p_value"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m134_cuped" -> m134Cuped,
    "m135_signflip_test" -> m135SignflipTest)

  val oracleSql: Map[String, String] = Map(
    "m134_cuped" ->
      s"""WITH pc AS (
        |  SELECT o_custkey,
        |    CAST(sum(CASE WHEN o_orderdate < DATE '1996-01-01'
        |      THEN CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN o_orderdate >= DATE '1996-01-01'
        |      THEN CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM pc)
        |SELECT n,
        |  round($cuCov / $cuVarX, 4) AS theta,
        |  round($cuCov / sqrt($cuVarX * $cuVarY), 4) AS corr_xy,
        |  round(($cuCov * $cuCov) / ($cuVarX * $cuVarY), 4) AS var_reduction
        |FROM agg""".stripMargin,
    "m135_signflip_test" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |    CAST(sum(CASE WHEN o_orderdate < DATE '1996-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
        |    CAST(sum(CASE WHEN o_orderdate >= DATE '1996-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_post,
        |    CAST(sum(CASE WHEN o_orderdate < DATE '1996-01-01'
        |      THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_pre,
        |    CAST(sum(CASE WHEN o_orderdate >= DATE '1996-01-01'
        |      THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_post
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT o_custkey,
        |    CAST(floor((CAST(s_post AS DOUBLE) / n_post - CAST(s_pre AS DOUBLE) / n_pre) * 100 + 0.5) AS BIGINT) AS dq
        |  FROM pc WHERE n_pre > 0 AND n_post > 0),
        |obs AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(dq) AS BIGINT) AS t_obs
        |  FROM pairs),
        |reps AS (
        |  SELECT b.b,
        |    CAST(sum(CASE WHEN (instr('0123456789abcdef', substr(md5(concat(o_custkey, ':', b.b, ':flip')), 1, 1)) - 1) < 8
        |      THEN dq ELSE -dq END) AS BIGINT) AS tb
        |  FROM pairs CROSS JOIN (SELECT unnest(range(1, 33)) AS b) b
        |  GROUP BY 1),
        |fin AS (
        |  SELECT max(n_pairs) AS n_pairs, max(t_obs) AS t_obs_q,
        |    CAST(sum(CASE WHEN abs(tb) >= abs(t_obs) THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
        |  FROM reps CROSS JOIN obs)
        |SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
        |  round(CAST(t_obs_q AS DOUBLE) / (100.0 * 100.0 * n_pairs), 4) AS mean_diff_dollars,
        |  n_extreme,
        |  round((1.0 + n_extreme) / 33.0, 4) AS p_value
        |FROM fin""".stripMargin)
}
