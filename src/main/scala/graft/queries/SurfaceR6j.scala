package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-6 wave 7: SQL PIVOT syntax, calendar/interval arithmetic,
  * quantile winsorization, and reproducible class balancing — the last
  * two being curation passes a training pipeline runs after profiling.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.4 (aggregates), §2.8 (functions), §2.9 (LLM ops).
  */
object SurfaceR6j extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- Q18: SQL PIVOT syntax ----

  /** Q18: the SQL PIVOT clause (a11 covers the DataFrame `.pivot` API;
    * this is the parser surface). Same engine mechanics either way: one
    * hash agg on (returnflag, linestatus) then a tiny transpose of the
    * low-cardinality column — the safe pivot shape at any scale because
    * the wide axis is bounded by the domain, not the data volume. */
  val q18SqlPivot: Q = (s, d) => {
    lineitem(s, d).createOrReplaceTempView("graft_lineitem")
    s.sql(
      """SELECT * FROM (
        |  SELECT l_returnflag, l_linestatus, l_quantity FROM graft_lineitem)
        |PIVOT (sum(l_quantity) FOR l_linestatus IN ('O' AS o, 'F' AS f))
        |ORDER BY l_returnflag""".stripMargin)
      .select(col("l_returnflag"), r4(col("o")).as("o_qty"),
        r4(col("f")).as("f_qty"))
  }

  // ---- F25: calendar / interval arithmetic ----

  /** F25: interval arithmetic and calendar navigation — +3 days,
    * calendar-aware +2 months, month start/end, day deltas. All
    * codegen'd scalar math on the int96-free date/timestamp encodings;
    * narrow projection, no shuffle. */
  val f25Interval: Q = (s, d) =>
    orders(s, d)
      .select(col("o_orderkey"),
        (col("o_orderdate") + expr("INTERVAL 3 DAY")).as("plus3d"),
        (col("o_orderdate") + expr("INTERVAL 2 MONTH")).as("plus2mo"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(col("o_orderdate"), lit("2024-01-01").cast("date")).as("days_since"))
      .orderBy("o_orderkey")
      .limit(500)

  // ---- LP13: winsorization ----

  /** LP13: quantile clipping (winsorize at p05/p95 per group) — the
    * outlier-control pass before numeric features feed a model. Two
    * passes: exact per-group quantiles (one agg; percentile_approx is
    * the drop-in at 100 TB, with this exact form as its error oracle),
    * then a broadcast join + clip + re-agg. Emits clip counts and the
    * clipped mean so the whole transform is hash-checked. */
  val lp13Winsorize: Q = (s, d) => {
    val li = lineitem(s, d)
    val bounds = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.05)").as("p05"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
    val clipped = li.join(broadcast(bounds), "l_returnflag")
      .withColumn("clip",
        when(col("l_extendedprice") < col("p05"), col("p05"))
          .when(col("l_extendedprice") > col("p95"), col("p95"))
          .otherwise(col("l_extendedprice")))
    clipped.groupBy("l_returnflag")
      .agg(
        count(when(col("l_extendedprice") < col("p05"), 1)).as("n_low"),
        count(when(col("l_extendedprice") > col("p95"), 1)).as("n_high"),
        r4(avg("clip")).as("avg_clipped"))
      .orderBy("l_returnflag")
  }

  // ---- LP14: reproducible class balancing ----

  /** LP14: balance classes by downsampling every label to the minority
    * count, with md5 rank as the tiebreak — "random" selection that is a
    * pure function of the row id, so the balanced set survives
    * repartitioning, retries, and re-ingestion (same property as the
    * lp10 split). One window per class + one broadcast scalar; at scale
    * the rank-filter is a bounded-heap top-k per class (x5 shape), not a
    * full sort. */
  val lp14ClassBalance: Q = (s, d) => {
    val e = embeddings(s, d).select(col("vec_id"), col("label"))
    val minCount = e.groupBy("label").count()
      .agg(min("count").as("m"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("label")
      .orderBy(md5(col("vec_id").cast("string").cast("binary")), col("vec_id"))
    e.withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(minCount))
      .where(col("rk") <= col("m"))
      .select(col("vec_id"), col("label"))
      .orderBy("vec_id")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "q18_sql_pivot" -> q18SqlPivot,
    "f25_interval" -> f25Interval,
    "lp13_winsorize" -> lp13Winsorize,
    "lp14_class_balance" -> lp14ClassBalance)

  val oracleSql: Map[String, String] = Map(
    "q18_sql_pivot" ->
      """SELECT l_returnflag,
        |  round(sum(l_quantity) FILTER (l_linestatus = 'O'), 4) AS o_qty,
        |  round(sum(l_quantity) FILTER (l_linestatus = 'F'), 4) AS f_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "f25_interval" ->
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 3 DAY AS plus3d,
        |  o_orderdate + INTERVAL 2 MONTH AS plus2mo,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  last_day(o_orderdate) AS month_end,
        |  CAST(datediff('day', DATE '2024-01-01',
        |                CAST(o_orderdate AS DATE)) AS INT) AS days_since
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin,
    "lp13_winsorize" ->
      """WITH p AS (
        |  SELECT l_returnflag,
        |    percentile_cont(0.05) WITHIN GROUP (ORDER BY l_extendedprice) AS p05,
        |    percentile_cont(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag,
        |  count(*) FILTER (l_extendedprice < p05) AS n_low,
        |  count(*) FILTER (l_extendedprice > p95) AS n_high,
        |  round(avg(CASE WHEN l_extendedprice < p05 THEN p05
        |                 WHEN l_extendedprice > p95 THEN p95
        |                 ELSE l_extendedprice END), 4) AS avg_clipped
        |FROM lineitem l JOIN p USING (l_returnflag)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,
    "lp14_class_balance" ->
      """WITH m AS (
        |  SELECT min(n) AS m FROM (
        |    SELECT label, count(*) AS n FROM embeddings GROUP BY label)),
        |rk AS (
        |  SELECT vec_id, label,
        |    row_number() OVER (PARTITION BY label
        |      ORDER BY md5(vec_id || ''), vec_id) AS rk
        |  FROM embeddings)
        |SELECT vec_id, label FROM rk CROSS JOIN m
        |WHERE rk <= m ORDER BY vec_id""".stripMargin)
}
