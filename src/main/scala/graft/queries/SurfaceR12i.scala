package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.PrefixSum

/** Round-12 surface batch 9: two metrics every product/ML team runs —
  *
  *  - a34 TRAILING-WINDOW DISTINCT (DAU/WAU/stickiness): the classic
  *    "you cannot subtract distincts" problem — q28's cumulative reach
  *    is monotone since launch, t1 buckets by tumbling window; the
  *    trailing-7-day DISTINCT is neither, and the scalable exact form
  *    is the BOUNDED EXPLODE: each (user, active-day) covers the 7
  *    report days it participates in, distinct (user, report-day),
  *    count — linear ×7, no window over users, subtractable nowhere
  *    and never needed.
  *  - m213 PR-AUC (average precision): m32 gives ROC-AUC, which flatters
  *    classifiers on imbalanced data; average precision is the standard
  *    imbalanced-eval companion. Computed tie-aware over DISTINCT score
  *    groups in descending order (AP = Σ_g (posv_g/npos) · P_g with P_g
  *    the precision at the group boundary — the sklearn step
  *    definition), with the descending cumulative from [[PrefixSum]] on
  *    the negated score (the m32 shape), per-group terms quantized to
  *    the 1e-6 grid before the cross-group sum.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 (product analytics; evaluation).
  */
object SurfaceR12i extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** A34: DAU, trailing-7-day WAU, and stickiness per day. */
  val a34SlidingDistinct: Q = (s, d) => {
    val act = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val mx = act.agg(max("d").as("mxd"))
    val dau = act.groupBy(col("d").as("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = act
      .select(col("user_id"),
        explode(expr("transform(sequence(0, 6), i -> date_add(d, i))")).as("day"))
      .distinct()
      .crossJoin(broadcast(mx))
      .where(col("day") <= col("mxd"))
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        Orc.r4(col("dau").cast("double") / col("wau").cast("double"))
          .as("stickiness"))
      .orderBy("day")
  }

  /** M213: average precision of `value` as a purchase score (the m32
    * fixture, so ROC-AUC and PR-AUC are directly comparable). */
  val m213PrAuc: Q = (s, d) => {
    val e = events(s, d).select(col("value"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val byV = e.groupBy("value")
      .agg(count(lit(1)).as("nv"), sum("y").as("posv"))
      .withColumn("negv", -col("value"))
    val cum = PrefixSum.withRunningTotals(byV, Seq("negv"),
      Seq("nv" -> "cumall", "posv" -> "cumpos"), numPartitions = 16)
    val terms = cum.select(col("posv"), col("nv"),
      // per-group term posv·P_g quantized BEFORE the cross-group sum:
      // the division is the only non-integer op and its 1e-6 grid
      // absorbs the sub-ulp engine split (§5.3 ln/exp rule)
      expr("CAST(floor(CAST(posv * cumpos AS DOUBLE) / cumall * 1000000" +
        " + 0.5) AS BIGINT)").as("qt"))
    terms.agg(sum("qt").as("sqt"), sum("posv").as("npos"),
        sum("nv").as("ntot"))
      .select(col("npos"), col("ntot"),
        Orc.r4(col("sqt").cast("double") /
          (lit(1000000.0) * col("npos").cast("double"))).as("pr_auc"),
        // the no-skill baseline AP = prevalence, for the readout
        Orc.r4(col("npos").cast("double") / col("ntot").cast("double"))
          .as("prevalence"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "a34_sliding_distinct" -> a34SlidingDistinct,
    "m213_pr_auc" -> m213PrAuc)

  val oracleSql: Map[String, String] = Map(
    "a34_sliding_distinct" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
        |  FROM events),
        |mx AS (SELECT max(d) AS mxd FROM act),
        |dau AS (SELECT d AS day, CAST(count(*) AS BIGINT) AS dau
        |        FROM act GROUP BY 1),
        |cover AS (
        |  SELECT DISTINCT user_id, d + CAST(i AS INTEGER) AS day
        |  FROM act, (SELECT unnest(generate_series(0, 6)) AS i)),
        |wau AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS wau
        |  FROM cover CROSS JOIN mx WHERE day <= mxd GROUP BY 1)
        |SELECT day, dau, wau,
        |  round(CAST(dau AS DOUBLE) / wau, 4) AS stickiness
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
    "m213_pr_auc" ->
      """WITH byv AS (
        |  SELECT value, CAST(count(*) AS BIGINT) AS nv,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS posv
        |  FROM events GROUP BY 1),
        |cum AS (
        |  SELECT posv, nv,
        |    CAST(sum(nv) OVER (ORDER BY -value) AS BIGINT) AS cumall,
        |    CAST(sum(posv) OVER (ORDER BY -value) AS BIGINT) AS cumpos
        |  FROM byv),
        |terms AS (
        |  SELECT posv, nv,
        |    CAST(floor(CAST(posv * cumpos AS DOUBLE) / cumall * 1000000
        |      + 0.5) AS BIGINT) AS qt
        |  FROM cum)
        |SELECT CAST(sum(posv) AS BIGINT) AS npos,
        |  CAST(sum(nv) AS BIGINT) AS ntot,
        |  round(CAST(sum(qt) AS DOUBLE) / (1000000.0 * sum(posv)), 4)
        |    AS pr_auc,
        |  round(CAST(sum(posv) AS DOUBLE) / sum(nv), 4) AS prevalence
        |FROM terms""".stripMargin)
}
