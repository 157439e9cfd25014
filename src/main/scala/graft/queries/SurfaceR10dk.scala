package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 115: funnel stage latency and LIMIT/OFFSET
  * pagination semantics.
  *
  * Contrast with near-siblings: q19 counts WHO converts through
  * view→click→purchase and q22 attributes credit; neither says how
  * LONG conversion takes. q48 measures the latency distribution of
  * each stage transition — per user, first view to first subsequent
  * click to first subsequent purchase — with exact quadrupled-percentile
  * quartiles on integer second deltas (4x keeps quarter-fraction
  * interpolation integral, so the BIGINT cast cannot split); q43's interpurchase gap is a
  * single-event-type recurrence, not a cross-stage funnel. x27 covers
  * the SQL pagination path (ORDER BY … LIMIT k OFFSET n): q7's
  * TakeOrdered stops at a prefix; OFFSET requires the engine to skip
  * a sorted prefix deterministically — correct only over a TOTAL
  * order, which the query pins with a unique key tiebreak (the
  * pagination contract a dashboard API depends on).
  *
  * Float discipline: latencies are integer seconds (epoch-micro
  * division), quartiles via the doubled-percentile idiom at binary-
  * exact fractions; x27 is integer/string only.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.11 (analytics) and §2.2 (SQL surface);
  * siblings q19/q22/q43, q7 (SparkEntry).
  */
object SurfaceR10dk extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Q48: FUNNEL LATENCY — per user: t_view = first view, t_click =
    * first click AFTER t_view, t_purchase = first purchase AFTER
    * t_click; report, per transition, the converter count and the
    * exact quartiles of the latency in seconds.
    *
    * Scale shape: three per-user min-aggs (map-side combinable, one
    * shuffle each on the user key) and a 2-row closing percentile agg
    * — no windows over facts, no self-join fanout.
    */
  val q48FunnelLatency: Q = (s, d) => {
    val e = events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) DIV 1000000").as("sec"))
    val v = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("sec").as("tv"))
    val c = e.where(col("event_type") === "click").join(v, "user_id")
      .where(col("sec") >= col("tv"))
      .groupBy("user_id").agg(min("sec").as("tc"), min("tv").as("tv"))
    val p = e.where(col("event_type") === "purchase").join(c, "user_id")
      .where(col("sec") >= col("tc"))
      .groupBy("user_id").agg(min("sec").as("tp"), min("tc").as("tc2"))
    val vc = c.select(lit("view_to_click").as("transition"),
      (col("tc") - col("tv")).as("lat"))
    val cp = p.select(lit("click_to_purchase").as("transition"),
      (col("tp") - col("tc2")).as("lat"))
    vc.union(cp).groupBy("transition")
      .agg(count(lit(1)).as("n_converters"),
        expr("CAST(percentile(4 * lat, 0.25) AS BIGINT)").as("q1_x4"),
        expr("CAST(percentile(4 * lat, 0.5) AS BIGINT)").as("med_x4"),
        expr("CAST(percentile(4 * lat, 0.75) AS BIGINT)").as("q3_x4"))
      .select(col("transition"), col("n_converters"),
        r4(expr("CAST(q1_x4 AS DOUBLE) / 4")).as("q1_sec"),
        r4(expr("CAST(med_x4 AS DOUBLE) / 4")).as("median_sec"),
        r4(expr("CAST(q3_x4 AS DOUBLE) / 4")).as("q3_sec"))
      .orderBy("transition")
  }

  /** X27: LIMIT/OFFSET — page 3 (rows 21–30) of orders by
    * (o_totalprice DESC, o_orderkey): the pagination contract needs a
    * TOTAL order or pages overlap nondeterministically; the unique-
    * key tiebreak is the point of the row.
    *
    * Scale shape: TakeOrdered with k = offset+limit — the engine
    * keeps a 30-row heap per partition, never sorts the table.
    */
  val x27LimitOffset: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("graft_x27_orders")
    s.sql(
      """SELECT o_orderkey, o_custkey,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |FROM graft_x27_orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 20""".stripMargin)
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "q48_funnel_latency" -> q48FunnelLatency,
    "x27_limit_offset" -> x27LimitOffset)

  val oracleSql: Map[String, String] = Map(
    "q48_funnel_latency" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    epoch_us(ts) // 1000000 AS sec
        |  FROM events),
        |v AS (
        |  SELECT user_id, CAST(min(sec) AS BIGINT) AS tv
        |  FROM e WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, CAST(min(e.sec) AS BIGINT) AS tc,
        |    CAST(min(v.tv) AS BIGINT) AS tv
        |  FROM e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.sec >= v.tv
        |  GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, CAST(min(e.sec) AS BIGINT) AS tp,
        |    CAST(min(c.tc) AS BIGINT) AS tc2
        |  FROM e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.sec >= c.tc
        |  GROUP BY 1),
        |lat AS (
        |  SELECT 'view_to_click' AS transition, tc - tv AS lat FROM c
        |  UNION ALL
        |  SELECT 'click_to_purchase' AS transition, tp - tc2 AS lat FROM p)
        |SELECT transition, CAST(count(*) AS BIGINT) AS n_converters,
        |  round(CAST(quantile_cont(4 * lat, 0.25) AS BIGINT) / 4.0, 4)
        |    AS q1_sec,
        |  round(CAST(quantile_cont(4 * lat, 0.5) AS BIGINT) / 4.0, 4)
        |    AS median_sec,
        |  round(CAST(quantile_cont(4 * lat, 0.75) AS BIGINT) / 4.0, 4)
        |    AS q3_sec
        |FROM lat GROUP BY transition ORDER BY transition""".stripMargin,
    "x27_limit_offset" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 20""".stripMargin)
}
