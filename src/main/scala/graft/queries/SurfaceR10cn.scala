package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.{PrefixMax, PrefixSum}

/** Round-10 surface batch 92: the 2-D skyline (Pareto-dominance)
  * query on a distributed prefix-max sweep, and Youden-J optimal
  * threshold selection on the exact ROC.
  *
  * Contrast with near-siblings: q27 ranks by ONE measure (Pareto
  * share); q37/w7 take top-k under ONE order; the skyline keeps every
  * row NO other row beats on ALL criteria at once (cheaper AND
  * bigger) — the multi-objective shortlist no single ranking can
  * express, and the canonical dominance-query operator. m32 reports
  * the ROC's AREA (threshold-free discrimination); m174 picks the
  * OPERATING POINT — the cut maximizing TPR−FPR (Youden's J) — which
  * is what a deployed filter actually needs, and the argmax is over
  * exact integer numerators so the chosen threshold is
  * bit-deterministic.
  *
  * Float discipline: skyline dominance compares exact integer cents
  * and sizes; the sweep's running max is integer. J's argmax uses the
  * integer numerator npos·cumneg − nneg·cumpos (ties → smallest
  * threshold); only the published rates divide.
  *
  * Scale shape — the point of this batch: both queries ride the
  * value-compression + range-partitioned prefix scheme
  * ([[graft.operators.PrefixMax]] / PrefixSum) instead of a global
  * window, so the sorted sweep never funnels through one task.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.12 (analytics shapes) and §2.13 (eval); siblings
  * q27/q37, m32 (SurfaceR8i), operators/PrefixSum.
  */
object SurfaceR10cn extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Q46: SKYLINE — parts nobody beats on (price, size): keep part p
    * unless some q has (price_q ≤ price_p AND size_q ≥ size_p) with
    * one strict. Split by the 2-D sweep identity: dominated ⟺
    * max-size among STRICTLY cheaper ≥ my size, OR max-size at MY
    * price > my size. Duplicate (price, size) pairs dominate neither
    * way and both survive — the spec pins that edge.
    *
    * Scale shape: facts → distinct-price hash agg (value
    * compression), PrefixMax's one range exchange for the strictly-
    * cheaper running max, one equi-join back on price. No global
    * window, no pairwise dominance join — O(n) + shuffle, vs the
    * naive O(n²) block-nested loop.
    */
  val q46Skyline: Q = (s, d) => {
    val pts = part(s, d).select(col("p_partkey"),
      expr("CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)").as("cents"),
      col("p_size").cast("long").as("size"))
    val levels = pts.groupBy("cents").agg(max("size").as("maxs"))
    val swept = PrefixMax.withRunningMax(levels, Seq("cents"), "maxs",
      inclCol = "incl", exclCol = "m1excl")
    pts.join(swept.select(col("cents"), col("maxs"), col("m1excl")), "cents")
      .where((col("m1excl").isNull || col("m1excl") < col("size")) &&
        !(col("size") < col("maxs")))
      .select(col("p_partkey"), col("cents").as("price_cents"), col("size"))
      .orderBy("p_partkey")
  }

  /** M174: YOUDEN THRESHOLD — on the m32 score/label pair (event
    * value vs purchase), find the cut t maximizing J = TPR − FPR for
    * the rule "positive when value > t". Per distinct score: both
    * cumulative counts ride ONE multi-series PrefixSum; the argmax
    * compares the integer numerator npos·cumneg − nneg·cumpos, ties
    * to the smallest threshold. Readout: threshold, J, TPR, FPR and
    * the class totals.
    */
  val m174YoudenThreshold: Q = (s, d) => {
    val e = events(s, d).select(col("value"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val byV = e.groupBy("value")
      .agg(count(lit(1)).as("nv"), sum("y").as("posv"))
    val cum = PrefixSum.withRunningTotals(byV, Seq("value"),
      Seq("nv" -> "cumall", "posv" -> "cumpos"))
      .withColumn("cumneg", col("cumall") - col("cumpos"))
    val tot = byV.agg(sum("nv").as("ntot"), sum("posv").as("npos"))
      .withColumn("nneg", col("ntot") - col("npos"))
    val scored = cum.crossJoin(broadcast(tot))
      .withColumn("jn", col("npos") * col("cumneg") -
        col("nneg") * col("cumpos"))
    val best = scored.agg(max("jn").as("jbest"))
    scored.crossJoin(broadcast(best))
      .where(col("jn") === col("jbest"))
      .orderBy(col("value").asc).limit(1)
      .select(col("value").as("threshold"),
        r4(expr("CAST(jn AS DOUBLE) / (npos * nneg)")).as("j_stat"),
        r4(expr("CAST(npos - cumpos AS DOUBLE) / npos")).as("tpr"),
        r4(expr("CAST(nneg - cumneg AS DOUBLE) / nneg")).as("fpr"),
        col("npos"), col("nneg"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "q46_skyline" -> q46Skyline,
    "m174_youden_threshold" -> m174YoudenThreshold)

  val oracleSql: Map[String, String] = Map(
    "q46_skyline" ->
      """WITH pts AS (
        |  SELECT p_partkey,
        |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(p_size AS BIGINT) AS size
        |  FROM part),
        |levels AS (
        |  SELECT cents, CAST(max(size) AS BIGINT) AS maxs
        |  FROM pts GROUP BY 1),
        |swept AS (
        |  SELECT cents, maxs,
        |    max(maxs) OVER (ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1excl
        |  FROM levels)
        |SELECT p_partkey, pts.cents AS price_cents, size
        |FROM pts JOIN swept ON pts.cents = swept.cents
        |WHERE (m1excl IS NULL OR m1excl < size) AND NOT (size < maxs)
        |ORDER BY p_partkey""".stripMargin,
    "m174_youden_threshold" ->
      """WITH e AS (
        |  SELECT value,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |by_v AS (
        |  SELECT value, CAST(count(*) AS BIGINT) AS nv,
        |    CAST(sum(y) AS BIGINT) AS posv
        |  FROM e GROUP BY 1),
        |cum AS (
        |  SELECT value, nv, posv,
        |    CAST(sum(nv) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cumall,
        |    CAST(sum(posv) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cumpos
        |  FROM by_v),
        |tot AS (
        |  SELECT CAST(sum(nv) AS BIGINT) AS ntot,
        |    CAST(sum(posv) AS BIGINT) AS npos
        |  FROM by_v),
        |scored AS (
        |  SELECT value, cumpos, cumall - cumpos AS cumneg,
        |    npos, ntot - npos AS nneg,
        |    npos * (cumall - cumpos) - (ntot - npos) * cumpos AS jn
        |  FROM cum CROSS JOIN tot)
        |SELECT value AS threshold,
        |  round(CAST(jn AS DOUBLE) / (npos * nneg), 4) AS j_stat,
        |  round(CAST(npos - cumpos AS DOUBLE) / npos, 4) AS tpr,
        |  round(CAST(nneg - cumneg AS DOUBLE) / nneg, 4) AS fpr,
        |  npos, nneg
        |FROM scored
        |WHERE jn = (SELECT max(jn) FROM scored)
        |ORDER BY value LIMIT 1""".stripMargin)
}
