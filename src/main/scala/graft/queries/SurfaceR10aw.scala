package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 49: temporal utilization + design-based
  * sampling — interval-union coverage (the classic sweep-line "how
  * much of the timeline is actually covered by overlapping jobs"
  * metric) and systematic probability-proportional-to-size sampling
  * (the survey-statistics workhorse: ONE pass over a cumulative-weight
  * axis, strictly deterministic, no per-row random draws to get wrong).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 (temporal analytics), §2.12 (sampling).
  */
object SurfaceR10aw extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- Q42: interval-union coverage ----

  /** Q42: INTERVAL COVERAGE — per supplier, the union length of its
    * 1995 shipment-service intervals (j16's interval construction:
    * [ship, ship + (1 + partkey%21) days]). The sweep: order by
    * start, carry the running max end over PRECEDING rows, and each
    * interval contributes max(0, end − max(start, prev_max_end)) —
    * overlap is never double-counted, gaps never bridged. Windows are
    * per-supplier (the per-entity shape that scales with executors);
    * epochs are exact integer seconds, so coverage and the
    * utilization ratio are bit-deterministic. */
  val q42IntervalCoverage: Q = (s, d) => {
    val li = lineitem(s, d)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("l_suppkey"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        expr("CAST(floor(unix_timestamp(l_shipdate)) AS BIGINT)").as("s0"),
        (expr("CAST(floor(unix_timestamp(l_shipdate)) AS BIGINT)") +
          (lit(1) + col("l_partkey") % 21) * 86400L).as("e0"))
    val w = Window.partitionBy("l_suppkey").orderBy(col("s0"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    li.withColumn("pmax", max(col("e0")).over(w))
      .withColumn("contrib",
        greatest(lit(0L), col("e0") -
          greatest(col("s0"), coalesce(col("pmax"), col("s0")))))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_intervals"),
        sum("contrib").as("covered_s"),
        (max("e0") - min("s0")).as("span_s"))
      .select(col("l_suppkey"), col("n_intervals"), col("covered_s"),
        col("span_s"),
        r4(expr("CAST(covered_s AS DOUBLE) / span_s")).as("utilization"))
      .orderBy("l_suppkey")
  }

  // ---- LP59: systematic PPS sampling ----

  private val ppsF =
    "CAST(floor(CAST(100 * %s + s_tot AS DOUBLE) / CAST(2 * s_tot AS DOUBLE)) AS BIGINT)"

  /** LP59: SYSTEMATIC PPS — select ~50 documents with probability
    * proportional to length by walking the cumulative-weight axis
    * with a fixed step S/50 and picking every document whose weight
    * span contains an odd multiple of S/100 (the u=½ systematic
    * offset). Inclusion is a PURE INTEGER predicate on (cum, cum−w):
    * count of odd multiples m·S ≤ 100x is ⌊(100x+S)/2S⌋ — no random
    * draws, no floats except one exactly-representable division, so
    * the sample is reproducible across engines, retries, and
    * repartitions. The cumulative weight runs through
    * [[graft.operators.PrefixSum]] — one range exchange, offsets
    * broadcast, NO single-partition window over documents (lp20's
    * Efraimidis–Spirakis draws per-row keys; this is its one-pass
    * fixed-size design-based sibling). */
  val lp59SystematicPps: Q = (s, d) => {
    val docs = documents(s, d).select(col("doc_id"), col("n_chars").as("w"))
    val tot = docs.agg(sum("w").as("s_tot"))
    val cum = graft.operators.PrefixSum.withRunningTotal(
      docs, sortCols = Seq("doc_id"), valueCol = "w", outCol = "cum")
    cum.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("w"), col("cum"),
        (expr(ppsF.format("cum")) - expr(ppsF.format("(cum - w)")))
          .as("n_hits"))
      .where(col("n_hits") > 0)
      .select(col("doc_id"), col("w"), col("cum"), col("n_hits"))
      .orderBy("doc_id")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "q42_interval_coverage" -> q42IntervalCoverage,
    "lp59_systematic_pps" -> lp59SystematicPps)

  val oracleSql: Map[String, String] = Map(
    "q42_interval_coverage" ->
      """WITH li AS (
        |  SELECT l_suppkey, l_orderkey * 8 + l_linenumber AS id,
        |    CAST(floor(epoch(l_shipdate)) AS BIGINT) AS s0,
        |    CAST(floor(epoch(l_shipdate)) AS BIGINT)
        |      + (1 + l_partkey % 21) * 86400 AS e0
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-01-01'),
        |sweep AS (
        |  SELECT l_suppkey, s0, e0,
        |    max(e0) OVER (PARTITION BY l_suppkey ORDER BY s0, id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM li),
        |contrib AS (
        |  SELECT l_suppkey, s0, e0,
        |    greatest(0, e0 - greatest(s0, coalesce(pmax, s0))) AS c
        |  FROM sweep)
        |SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(sum(c) AS BIGINT) AS covered_s,
        |  CAST(max(e0) - min(s0) AS BIGINT) AS span_s,
        |  round(CAST(sum(c) AS DOUBLE) / (max(e0) - min(s0)), 4) AS utilization
        |FROM contrib GROUP BY 1 ORDER BY 1""".stripMargin,
    "lp59_systematic_pps" -> {
      def f(x: String) =
        s"CAST(floor(CAST(100 * $x + s_tot AS DOUBLE) / CAST(2 * s_tot AS DOUBLE)) AS BIGINT)"
      s"""WITH docs AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w FROM documents),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS s_tot FROM docs),
        |cum AS (
        |  SELECT doc_id, w,
        |    CAST(sum(w) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM docs),
        |hits AS (
        |  SELECT doc_id, w, cum,
        |    ${f("cum")} - ${f("(cum - w)")} AS n_hits
        |  FROM cum CROSS JOIN tot)
        |SELECT doc_id, w, cum, n_hits
        |FROM hits WHERE n_hits > 0 ORDER BY doc_id""".stripMargin
    })
}
