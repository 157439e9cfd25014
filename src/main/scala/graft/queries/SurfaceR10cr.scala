package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.{Orc, Tables}

/** Round-10 surface batch 96: Granger predictive causality between
  * daily event series, and MMR (maximal-marginal-relevance)
  * diversified re-ranking.
  *
  * Contrast with near-siblings: lt22 (rolling correlation) and lt49
  * (lagged mutual information) MEASURE dependence between series;
  * Granger's F asks the PREDICTIVE question — does yesterday's click
  * count improve today's purchase forecast beyond yesterday's
  * purchases — by comparing restricted vs unrestricted lag
  * regressions, both closed-form here. ls3/ls4/ls6 rank by RELEVANCE
  * alone (and RRF fuses two relevance arms); MMR re-ranks for
  * relevance MINUS redundancy — each step picks argmax of
  * λ·rel − (1−λ)·max-sim-to-selected — the standard diversifier for
  * retrieval-augmented contexts, greedy and order-dependent, which is
  * why it is not expressible as any single ranking.
  *
  * Float discipline: Granger's series are integer daily counts; all
  * regression moments are exact BIGINTs and the F statistic is one
  * closed form. MMR's relevance/similarity are the shared cosine
  * (identical doubles both engines); each greedy argmax compares
  * those doubles with id tie-breaks, and the unrolled oracle replays
  * the same three steps.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.13 (time series) and §2.10 (retrieval); siblings
  * lt22/lt49, ls6 (SurfaceR10cd).
  */
object SurfaceR10cr extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // Granger: y_t ~ y_{t-1} [+ x_{t-1}]; closed forms over exact sums.
  // Restricted SSE from simple OLS; unrestricted from the 2-var solve.
  private val grC11 = "(s11 - CAST(s1 AS DOUBLE) * s1 / n)" // var(y_lag)
  private val grC22 = "(s22 - CAST(s2 AS DOUBLE) * s2 / n)" // var(x_lag)
  private val grC12 = "(s12 - CAST(s1 AS DOUBLE) * s2 / n)"
  private val grC1y = "(s1y - CAST(s1 AS DOUBLE) * sy / n)"
  private val grC2y = "(s2y - CAST(s2 AS DOUBLE) * sy / n)"
  private val grCyy = "(syy - CAST(sy AS DOUBLE) * sy / n)"
  private val grSseR = s"($grCyy - $grC1y * $grC1y / $grC11)"
  private val grDet = s"($grC11 * $grC22 - $grC12 * $grC12)"
  private val grB1 = s"(($grC22 * $grC1y - $grC12 * $grC2y) / $grDet)"
  private val grB2 = s"(($grC11 * $grC2y - $grC12 * $grC1y) / $grDet)"
  private val grSseU = s"($grCyy - $grB1 * $grC1y - $grB2 * $grC2y)"
  private val grF = s"((($grSseR - $grSseU) / 1.0) / ($grSseU / (n - 3)))"

  /** M176: GRANGER — purchase_t on purchase_{t−1} with and without
    * click_{t−1} (order 1, both directions). F > ~4 at these df reads
    * as "the other series helps predict". One row per direction.
    *
    * Scale shape: facts → per-(type, day) agg; the lag alignment is a
    * self-join on day+1 over the calendar-bounded daily table; one
    * exact moment row per direction.
    */
  val m176Granger: Q = (s, d) => {
    val daily = events(s, d)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
    val wide = daily.groupBy("day").agg(
      sum(when(col("event_type") === "click", col("x")).otherwise(0L)).as("c"),
      sum(when(col("event_type") === "purchase", col("x")).otherwise(0L)).as("p"))
    val lagged = wide.select(col("day"), col("c").as("c0"), col("p").as("p0"))
      .join(wide.select((col("day") + 1).as("day"), col("c").as("cl"),
        col("p").as("pl")), "day")
    def direction(name: String, y: String, ylag: String, xlag: String) =
      lagged.agg(count(lit(1)).as("n"),
        sum(ylag).as("s1"), sum(xlag).as("s2"), sum(y).as("sy"),
        sum(expr(s"$ylag * $ylag")).as("s11"),
        sum(expr(s"$xlag * $xlag")).as("s22"),
        sum(expr(s"$ylag * $xlag")).as("s12"),
        sum(expr(s"$ylag * $y")).as("s1y"),
        sum(expr(s"$xlag * $y")).as("s2y"),
        sum(expr(s"$y * $y")).as("syy"))
        .select(lit(name).as("direction"), col("n"),
          r4(expr(grF)).as("f_stat"),
          r4(expr(s"1.0 - $grSseU / $grCyy")).as("r2_unrestricted"),
          r4(expr(grB2)).as("cross_lag_coef"))
    direction("click->purchase", "p0", "pl", "cl")
      .unionAll(direction("purchase->click", "c0", "cl", "pl"))
      .orderBy("direction")
  }

  private val LAMBDA = "0.7"
  private val POOL = 8 // candidate pool: top-8 by relevance

  /** LS7: MMR — for probe vector 0, take the top-8 most similar
    * vectors as the candidate pool, then greedily pick 3 by maximal
    * marginal relevance λ·rel − (1−λ)·max-sim-to-picked (λ=0.7, ties
    * to the lower id). Readout: step, chosen id, its relevance, and
    * the MMR score at selection time — step 1 is pure relevance, the
    * later steps trade it against redundancy.
    *
    * Scale shape: the pool is a top-k (bounded broadcast); each
    * greedy step is one bounded argmax over ≤8 rows — at 100 TB the
    * pool comes from the ANN route and the loop shape is unchanged.
    */
  val ls7Mmr: Q = (s, d) => {
    val e = embeddings(s, d)
    val probe = e.where(col("vec_id") === 0)
      .select(col("embedding").as("q_emb")).limit(1)
    val pool = e.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        VectorFunctions.cosineSim(col("embedding"), col("q_emb")).as("rel"),
        col("embedding"))
      .orderBy(col("rel").desc, col("vec_id").asc).limit(POOL)
      .localCheckpoint(true)
    var picked = Seq.empty[(Long, Double, Double)] // (id, rel, score)
    for (step <- 1 to 3) {
      val remaining = pool.where(!col("vec_id").isInCollection(
        if (picked.isEmpty) Seq(-1L) else picked.map(_._1)))
      val scored =
        if (picked.isEmpty)
          remaining.withColumn("score", expr(s"$LAMBDA * rel"))
        else {
          val sel = pool.where(col("vec_id").isInCollection(picked.map(_._1)))
            .select(col("vec_id").as("s_id"), col("embedding").as("s_emb"))
          remaining.crossJoin(broadcast(sel))
            .withColumn("sim",
              VectorFunctions.cosineSim(col("embedding"), col("s_emb")))
            .groupBy("vec_id", "rel").agg(max("sim").as("maxsim"))
            .withColumn("score",
              expr(s"$LAMBDA * rel - (1 - $LAMBDA) * maxsim"))
        }
      val top = scored.orderBy(col("score").desc, col("vec_id").asc)
        .select("vec_id", "rel", "score").limit(1).collect().head
      picked :+= ((top.getLong(0), top.getDouble(1), top.getDouble(2)))
    }
    val s2 = s
    import s2.implicits._
    picked.zipWithIndex
      .map { case ((id, rel, sc), i) => (i + 1L, id, rel, sc) }
      .toDF("step", "vec_id", "rel_raw", "score_raw")
      .select(col("step"), col("vec_id"),
        r4(col("rel_raw")).as("relevance"), r4(col("score_raw")).as("mmr_score"))
      .orderBy("step")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m176_granger" -> m176Granger,
    "ls7_mmr" -> ls7Mmr)

  /** Unrolled 3-step greedy argmax; pool and picks MATERIALIZED. */
  private def mmrSql: String = {
    s"""WITH emb AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS MATERIALIZED (SELECT v AS qv FROM emb WHERE vec_id = 0),
       |pool AS MATERIALIZED (
       |  SELECT vec_id, list_cosine_similarity(v, qv) AS rel, v
       |  FROM emb CROSS JOIN q WHERE vec_id <> 0
       |  ORDER BY rel DESC, vec_id LIMIT $POOL),
       |p1 AS MATERIALIZED (
       |  SELECT vec_id, rel, $LAMBDA * rel AS score, v FROM pool
       |  ORDER BY score DESC, vec_id LIMIT 1),
       |sc2 AS MATERIALIZED (
       |  SELECT c.vec_id, c.rel,
       |    $LAMBDA * c.rel - (1 - $LAMBDA) *
       |      list_cosine_similarity(c.v, p1.v) AS score, c.v
       |  FROM pool c CROSS JOIN p1 WHERE c.vec_id <> p1.vec_id),
       |p2 AS MATERIALIZED (
       |  SELECT vec_id, rel, score, v FROM sc2
       |  ORDER BY score DESC, vec_id LIMIT 1),
       |sc3 AS MATERIALIZED (
       |  SELECT c.vec_id, c.rel,
       |    $LAMBDA * c.rel - (1 - $LAMBDA) * greatest(
       |      list_cosine_similarity(c.v, p1.v),
       |      list_cosine_similarity(c.v, p2.v)) AS score
       |  FROM pool c CROSS JOIN p1 CROSS JOIN p2
       |  WHERE c.vec_id <> p1.vec_id AND c.vec_id <> p2.vec_id),
       |p3 AS MATERIALIZED (
       |  SELECT vec_id, rel, score FROM sc3
       |  ORDER BY score DESC, vec_id LIMIT 1)
       |SELECT CAST(1 AS BIGINT) AS step, vec_id, round(rel, 4) AS relevance,
       |  round(score, 4) AS mmr_score FROM p1
       |UNION ALL
       |SELECT CAST(2 AS BIGINT), vec_id, round(rel, 4), round(score, 4) FROM p2
       |UNION ALL
       |SELECT CAST(3 AS BIGINT), vec_id, round(rel, 4), round(score, 4) FROM p3
       |ORDER BY step""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "m176_granger" ->
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
         |    CAST(count(*) AS BIGINT) AS x
         |  FROM events WHERE event_type IN ('click', 'purchase')
         |  GROUP BY 1, 2),
         |wide AS (
         |  SELECT day,
         |    CAST(sum(CASE WHEN event_type = 'click' THEN x ELSE 0 END)
         |      AS BIGINT) AS c,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN x ELSE 0 END)
         |      AS BIGINT) AS p
         |  FROM daily GROUP BY 1),
         |lagged AS (
         |  SELECT a.day, a.c AS c0, a.p AS p0, b.c AS cl, b.p AS pl
         |  FROM wide a JOIN wide b ON a.day = b.day + 1),
         |mom AS (
         |  SELECT 'click->purchase' AS direction,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(pl) AS BIGINT) AS s1, CAST(sum(cl) AS BIGINT) AS s2,
         |    CAST(sum(p0) AS BIGINT) AS sy,
         |    CAST(sum(pl * pl) AS BIGINT) AS s11,
         |    CAST(sum(cl * cl) AS BIGINT) AS s22,
         |    CAST(sum(pl * cl) AS BIGINT) AS s12,
         |    CAST(sum(pl * p0) AS BIGINT) AS s1y,
         |    CAST(sum(cl * p0) AS BIGINT) AS s2y,
         |    CAST(sum(p0 * p0) AS BIGINT) AS syy
         |  FROM lagged
         |  UNION ALL
         |  SELECT 'purchase->click',
         |    CAST(count(*) AS BIGINT),
         |    CAST(sum(cl) AS BIGINT), CAST(sum(pl) AS BIGINT),
         |    CAST(sum(c0) AS BIGINT),
         |    CAST(sum(cl * cl) AS BIGINT),
         |    CAST(sum(pl * pl) AS BIGINT),
         |    CAST(sum(cl * pl) AS BIGINT),
         |    CAST(sum(cl * c0) AS BIGINT),
         |    CAST(sum(pl * c0) AS BIGINT),
         |    CAST(sum(c0 * c0) AS BIGINT)
         |  FROM lagged)
         |SELECT direction, n,
         |  round($grF, 4) AS f_stat,
         |  round(1.0 - $grSseU / $grCyy, 4) AS r2_unrestricted,
         |  round($grB2, 4) AS cross_lag_coef
         |FROM mom ORDER BY direction""".stripMargin,
    "ls7_mmr" -> mmrSql)
}
