package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-5 query-surface additions: LATERAL correlated subquery,
  * time-spine gap fill, deterministic mode, fixed-width histogram,
  * edit-distance fuzzy match.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.4 (aggregates), §2.6 (SQL surface), §2.8 (time), §2.9
  * (functions).
  */
object SurfaceR5 extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** LATERAL correlated subquery — per-order line stats computed by a
    * correlated scalar-aggregate lateral; Catalyst decorrelates it into
    * a join + aggregate, so it scales like q2, not like a per-row loop.
    * Identical SQL text runs on both engines (only the view prefix
    * differs).
    */
  private def q14Sql(p: String): String =
    s"""SELECT o.o_orderkey, lat.n_items, lat.max_price
       |FROM ${p}orders o,
       |LATERAL (
       |  SELECT count(*) AS n_items, max(l_extendedprice) AS max_price
       |  FROM ${p}lineitem l WHERE l.l_orderkey = o.o_orderkey
       |) lat
       |WHERE o.o_orderkey % 50 = 0
       |ORDER BY o.o_orderkey""".stripMargin

  val q14LateralJoin: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("graft_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem")
    s.sql(q14Sql("graft_"))
  }

  /** T10: gap-filled hourly time spine — the canonical "no row ≠ no
    * data" fix for downstream window math. Spine = sequence() between
    * global min/max hour (one-row bounds agg, broadcast), crossed with
    * the distinct type dim (small, broadcast), left-joined to the real
    * hourly counts and zero-filled. The only shuffle is the counts agg;
    * the spine construction is driver-free and O(hours × types).
    */
  val t10GapFill: Q = (s, d) => {
    val ev = events(s, d)
      .withColumn("bucket", date_trunc("hour", col("ts")))
    val bounds = ev.agg(min("bucket").as("lo"), max("bucket").as("hi"))
    val spine = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR"))).as("bucket"))
    val types = ev.select("event_type").distinct()
    val counts = ev.groupBy("event_type", "bucket").agg(count(lit(1)).as("n"))
    types.crossJoin(spine)
      .join(counts, Seq("event_type", "bucket"), "left")
      .select(
        col("event_type"),
        unix_timestamp(col("bucket")).as("bucket_s"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy("event_type", "bucket_s")
  }

  /** A14: deterministic mode — `mode(x, deterministic = true)` returns
    * the smallest of the tied most-frequent values, so it is stable
    * under repartitioning (plain mode is not); the oracle reproduces the
    * same tiebreak with a count + row_number window.
    */
  val a14Mode: Q = (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(expr("mode(l_quantity, true)").as("mode_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** A15: fixed-width histogram as one hash aggregate — binning is an
    * identical floor expression on both engines (no width_bucket in the
    * oracle dialect; the width_bucket equivalence is spec-asserted).
    */
  val a15Histogram: Q = (s, d) =>
    orders(s, d)
      .withColumn("bucket", floor(col("o_totalprice") / 25000.0))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"), r4(avg("o_totalprice")).as("avg_price"))
      .orderBy("bucket")

  /** F13: edit-distance fuzzy match (levenshtein) — the string-side
    * companion to the embedding near-dup family. O(n²·len²) as written;
    * at scale the candidate set comes from L2 banding first and the
    * exact distance verifies candidates only.
    */
  val f13Levenshtein: Q = (s, d) => {
    val n = nation(s, d)
    val a = n.select(col("n_nationkey").as("a_key"), col("n_name").as("a_name"))
    val b = n.select(col("n_nationkey").as("b_key"), col("n_name").as("b_name"))
    a.join(b, col("a_key") < col("b_key"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .where(col("dist") <= 1)
      .select(col("a_name"), col("b_name"), col("dist"))
      .orderBy("a_name", "b_name")
  }

  /** A16: mergeable distinct-count sketches — the 100 TB reaggregation
    * pattern. `hll_sketch_agg` builds a DataSketches HLL per fine-grain
    * group; `hll_union_agg` merges the BINARY sketches to a coarser
    * grain WITHOUT rescanning the fact table. countDistinct cannot
    * reaggregate (distinct sets don't sum); sketches can — that is what
    * makes pre-aggregated distinct-count tables possible at scale.
    * Driver-verified tolerance row (a3/a9 pattern): the exact
    * countDistinct is bit-checked against the oracle, and the
    * estimator-specific union estimate is folded into `approx_ok`
    * (relative error ≤ 5%, generous vs the sketch's ~1.6% default
    * bound) which the oracle pins to literal TRUE.
    */
  val a16HllUnion: Q = (s, d) => {
    val sketches = lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
    val merged = sketches.groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_parts"))
    val exact = lineitem(s, d).groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    exact.join(merged, "l_returnflag")
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts").cast("double") - col("exact_parts").cast("double"))
          <= col("exact_parts").cast("double") * lit(0.05)).as("approx_ok"))
      .orderBy("l_returnflag")
  }

  /** A17: partial-aggregate reaggregation — incremental pipelines store
    * decomposable partials (sum, count) per fine grain and re-derive
    * coarser averages without touching raw data. Oracle reproduces the
    * two-stage computation; Avg itself is NOT reaggregatable, which is
    * the point of storing (sum, count).
    */
  val a17PartialReagg: Q = (s, d) => {
    val partial = lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("c"))
    partial.groupBy("l_returnflag")
      .agg(
        r4(sum("s") / sum("c")).as("avg_qty"),
        sum("c").as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** LP7: one-pass column profiler — data-quality bookkeeping (null
    * counts, cardinality, length stats) for a text corpus as a SINGLE
    * aggregate over the table, pivoted to a row per column with stack().
    * At 100 TB this is the only affordable shape: one scan, all metrics.
    */
  val lp7Profile: Q = (s, d) => {
    def m(c: String) = Seq(
      count(col(c)).as(s"${c}_nonnull"),
      countDistinct(col(c)).as(s"${c}_distinct"),
      min(length(col(c))).as(s"${c}_minlen"),
      max(length(col(c))).as(s"${c}_maxlen"),
      r4(avg(length(col(c)))).as(s"${c}_avglen"))
    val cols = Seq("text", "lang", "source")
    val one = documents(s, d).agg(m(cols.head).head,
      (m(cols.head).tail ++ cols.tail.flatMap(m)): _*)
    one.selectExpr(
      s"""stack(${cols.length}, ${cols.map(c =>
        s"'$c', ${c}_nonnull, ${c}_distinct, ${c}_minlen, ${c}_maxlen, ${c}_avglen")
        .mkString(", ")}) AS (col_name, n_nonnull, n_distinct, min_len, max_len, avg_len4)""")
      .orderBy("col_name")
  }

  /** S10: XML source/sink roundtrip — write the dim as XML files
    * (rowTag framing), read them back with an explicit schema, and
    * reproduce the base projection. Same contract as the CSV/JSON/ORC
    * roundtrips: the oracle reads the parquet base directly, so any
    * serialization drift (types, escaping, nulls) fails the compare.
    */
  val s10XmlRoundtrip: Q = (s, d) => {
    val out = new java.io.File("target/tmp/s10_xml").getAbsolutePath
    nation(s, d).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.mode("overwrite").option("rowTag", "nation").format("xml").save(out)
    s.read.format("xml").option("rowTag", "nation")
      .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
      .load(out)
      .orderBy("n_nationkey")
  }

  /** F14: error-safe functions — try_cast/try_divide return NULL instead
    * of failing under ANSI mode, the behavior batch pipelines over dirty
    * data need (one bad cell must not kill a 100 TB job). The oracle
    * maps try_divide to plain division (NULL-on-zero is the oracle
    * dialect's native behavior).
    */
  val f14TryFuncs: Q = (s, d) =>
    nation(s, d).select(
      col("n_nationkey"),
      expr("try_cast(n_name AS INT)").as("bad_cast"),
      expr("try_cast(substring(n_name, 8) AS INT)").as("num_part"),
      r4(expr("try_divide(CAST(n_nationkey AS DOUBLE), CAST(n_regionkey AS DOUBLE))"))
        .as("ratio4"))
      .orderBy("n_nationkey")

  /** W9: IGNORE NULLS navigation — lead over the next NON-NULL
    * observation and nth_value(2) of the non-null sequence; the
    * gap-tolerant navigation shape for sparse sensor/metric columns.
    */
  val w9IgnoreNulls: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    events(s, d)
      .withColumn("x",
        when(col("event_type") === "click", lit(null)).otherwise(col("value")))
      .select(
        col("event_id"),
        r4(lead(col("x"), 1, null, ignoreNulls = true).over(w)).as("next_x4"),
        r4(nth_value(col("x"), 2, ignoreNulls = true).over(wf)).as("second_x4"))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "s10_xml_roundtrip" -> s10XmlRoundtrip,
    "f14_try_funcs" -> f14TryFuncs,
    "w9_ignore_nulls" -> w9IgnoreNulls,
    "q14_lateral_join" -> q14LateralJoin,
    "t10_gap_fill" -> t10GapFill,
    "a14_mode" -> a14Mode,
    "a15_histogram" -> a15Histogram,
    "f13_levenshtein" -> f13Levenshtein,
    "a16_hll_union" -> a16HllUnion,
    "a17_partial_reagg" -> a17PartialReagg,
    "lp7_profile" -> lp7Profile)

  val oracleSql: Map[String, String] = Map(
    "s10_xml_roundtrip" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    "f14_try_funcs" ->
      """SELECT n_nationkey,
        |  TRY_CAST(n_name AS INTEGER) AS bad_cast,
        |  TRY_CAST(substr(n_name, 8) AS INTEGER) AS num_part,
        |  round(CAST(n_nationkey AS DOUBLE) / CAST(n_regionkey AS DOUBLE), 4)
        |    AS ratio4
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "w9_ignore_nulls" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN event_type = 'click' THEN NULL ELSE value END AS x
        |  FROM events
        |)
        |SELECT event_id,
        |  round(lead(x IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id), 4) AS next_x4,
        |  round(nth_value(x, 2 IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4)
        |    AS second_x4
        |FROM e ORDER BY event_id""".stripMargin,
    "q14_lateral_join" -> q14Sql(""),
    "t10_gap_fill" ->
      """WITH ev AS (
        |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket
        |  FROM events
        |),
        |b AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM ev),
        |spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM b
        |),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |counts AS (SELECT event_type, bucket, count(*) AS n FROM ev GROUP BY 1, 2)
        |SELECT t.event_type,
        |  CAST(epoch(s.bucket) AS BIGINT) AS bucket_s,
        |  coalesce(c.n, CAST(0 AS BIGINT)) AS n_events
        |FROM types t CROSS JOIN spine s
        |LEFT JOIN counts c ON c.event_type = t.event_type AND c.bucket = s.bucket
        |ORDER BY t.event_type, bucket_s""".stripMargin,
    "a14_mode" ->
      """SELECT l_returnflag, mode_qty, n_rows FROM (
        |  SELECT l_returnflag, l_quantity AS mode_qty,
        |    CAST(sum(count(*)) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n_rows,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY count(*) DESC, l_quantity ASC) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_quantity
        |) WHERE rn = 1
        |ORDER BY l_returnflag""".stripMargin,
    "a15_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        | count(*) AS n_orders, round(avg(o_totalprice), 4) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "f13_levenshtein" ->
      """SELECT a.n_name AS a_name, b.n_name AS b_name,
        |  CAST(levenshtein(a.n_name, b.n_name) AS INTEGER) AS dist
        |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
        |WHERE levenshtein(a.n_name, b.n_name) <= 1
        |ORDER BY a_name, b_name""".stripMargin,
    // exact distincts bit-checked; the sketch-union estimate envelope
    // flag is pinned to literal TRUE (a3/a9 driver-verified pattern —
    // DuckDB need not reproduce DataSketches HLL)
    "a16_hll_union" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  true AS approx_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "a17_partial_reagg" ->
      """WITH p AS (
        |  SELECT l_returnflag, l_linestatus,
        |    sum(l_quantity) AS s, count(*) AS c
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus
        |)
        |SELECT l_returnflag,
        |  round(sum(s) / CAST(sum(c) AS BIGINT), 4) AS avg_qty,
        |  CAST(sum(c) AS BIGINT) AS n_rows
        |FROM p GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "lp7_profile" ->
      """SELECT col_name, n_nonnull, n_distinct, min_len, max_len, avg_len4
        |FROM (
        |  SELECT 'text' AS col_name, count(text) AS n_nonnull,
        |    count(DISTINCT text) AS n_distinct,
        |    CAST(min(length(text)) AS INTEGER) AS min_len,
        |    CAST(max(length(text)) AS INTEGER) AS max_len,
        |    round(avg(length(text)), 4) AS avg_len4 FROM documents
        |  UNION ALL
        |  SELECT 'lang', count(lang), count(DISTINCT lang),
        |    CAST(min(length(lang)) AS INTEGER), CAST(max(length(lang)) AS INTEGER),
        |    round(avg(length(lang)), 4) FROM documents
        |  UNION ALL
        |  SELECT 'source', count(source), count(DISTINCT source),
        |    CAST(min(length(source)) AS INTEGER), CAST(max(length(source)) AS INTEGER),
        |    round(avg(length(source)), 4) FROM documents
        |) ORDER BY col_name""".stripMargin)
}
