package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-11 surface batch 3: Holt–Winters triple exponential smoothing
  * (the seasonal member lt17's Holt was missing) and winnowing
  * document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
  * the MOSS algorithm), both with exact-replay oracles.
  *
  * Contrast with near-siblings: t15 EWMA smooths level only, lt17 Holt
  * adds trend; lt69 adds the third component — a length-7 additive
  * seasonal cycle — which is what makes a weekly-patterned series
  * forecastable (lt12 MEASURES seasonal strength; lt69 models it).
  * lf_fingerprint hashes fixed-stride chunks (a shifted copy slips
  * between stride boundaries); lt23 compares full shingle SETS; lt70's
  * winnowing selects the window-minimum k-gram hash, which GUARANTEES
  * any shared substring of length ≥ w+k−1 = 19 yields a shared
  * fingerprint while storing only ~2/(w+1) of the grams — the
  * position-robust containment detector at archive scale.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.13 (time series), §2.10 (near-dup detection).
  */
object SurfaceR11c extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LT69: Holt–Winters ----

  /** LT69: HOLT–WINTERS ADDITIVE SMOOTHING — level+trend+season
    * (α=0.5, β=0.3, γ=0.3, season length L=7 days) over each event
    * type's daily-mean series; types with under two full seasons are
    * excluded. The recursion is a genuine fold with VECTOR state: the
    * accumulator carries (count, warmup-sum, level, trend, and the
    * last 7 seasonal components AS A QUEUE — head = the component the
    * next step consumes), so the seasonal update is "pop head, push
    * new" with no indexed writes. Initialization is sequential too
    * (the first-season mean accumulates in recursion order), so every
    * fp op on both engines happens in the identical order — the lt17
    * replay discipline extended to array state. Forecasts
    * x̂(n+h) = l + h·b + s_queue[h]. Scale: the fold state is per-GROUP
    * and O(L); series length is bounded by distinct DAYS — the daily
    * pre-aggregation is the distributed pass. */
  val lt69HoltWinters: Q = (s, d) => {
    // Per-row values quantized to the 1e-6 grid BEFORE the daily mean
    // (sum of exact integers / count), so the doubles seeding the fold
    // are bit-identical cross-engine — a raw avg()'s summation order
    // can differ by an ulp, the knife-edge class lt71 hit (ADVICE r11).
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)" +
        " / (count(*) * 1000000.0)").as("v"))
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("v")))).as("sv"),
        count(lit(1)).as("n_days"))
      .where(col("n_days") >= 14)
      .select(col("event_type"), col("n_days"),
        expr("""aggregate(sv,
          named_struct('i', 0, 'sm', cast(0.0 as double),
            'l', cast(0.0 as double), 'b', cast(0.0 as double),
            's', cast(array() as array<double>)),
          (acc, x) -> CASE
            WHEN acc.i = 0 THEN named_struct('i', 1, 'sm', x.v,
              'l', cast(0.0 as double), 'b', cast(0.0 as double),
              's', array(x.v))
            WHEN acc.i < 6 THEN named_struct('i', acc.i + 1,
              'sm', acc.sm + x.v,
              'l', cast(0.0 as double), 'b', cast(0.0 as double),
              's', concat(acc.s, array(x.v)))
            WHEN acc.i = 6 THEN named_struct('i', 7,
              'sm', cast(0.0 as double),
              'l', (acc.sm + x.v) / 7.0, 'b', cast(0.0 as double),
              's', transform(concat(acc.s, array(x.v)),
                e -> e - (acc.sm + x.v) / 7.0))
            ELSE named_struct('i', acc.i + 1, 'sm', cast(0.0 as double),
              'l', 0.5 * (x.v - element_at(acc.s, 1)) + 0.5 * (acc.l + acc.b),
              'b', 0.3 * ((0.5 * (x.v - element_at(acc.s, 1))
                     + 0.5 * (acc.l + acc.b)) - acc.l) + 0.7 * acc.b,
              's', concat(slice(acc.s, 2, 6),
                array(0.3 * (x.v - (0.5 * (x.v - element_at(acc.s, 1))
                        + 0.5 * (acc.l + acc.b)))
                      + 0.7 * element_at(acc.s, 1))))
          END)""").as("hw"))
      .select(col("event_type"), col("n_days"),
        r4(col("hw.l")).as("level"),
        r4(col("hw.b")).as("trend"),
        r4(col("hw.l") + lit(1) * col("hw.b") + element_at(col("hw.s"), 1)).as("f1"),
        r4(col("hw.l") + lit(2) * col("hw.b") + element_at(col("hw.s"), 2)).as("f2"),
        r4(col("hw.l") + lit(3) * col("hw.b") + element_at(col("hw.s"), 3)).as("f3"))
      .orderBy("event_type")
  }

  // ---- LT70: winnowing fingerprints ----

  /** LT70: WINNOWING CONTAINMENT PAIRS — per document, hash every
    * 12-byte gram (md5 — the cross-engine hash), keep the MINIMUM hash
    * of each 8-gram sliding window (distinct per doc), drop promiscuous
    * fingerprints (document frequency > 5 — the stop-token cut that
    * keeps boilerplate from pairing everything), and report document
    * pairs sharing ≥ 8 surviving fingerprints. The guarantee (SIGMOD
    * 2003): any shared substring of ≥ 19 bytes contributes a shared
    * fingerprint, at ~2/(w+1) = 22% of gram storage. Scale shape: one
    * bounded ROWS window per doc (partitioned by doc_id), then a
    * postings-style equi-join on fingerprint hash — candidate volume is
    * df-capped per hash, never all-pairs. */
  val lt70Winnowing: Q = (s, d) => {
    val grams = documents(s, d)
      .where(length(col("text")) >= 12)
      .select(col("doc_id"),
        posexplode(expr("transform(sequence(1, length(text) - 11)," +
          " p -> md5(substr(text, p, 12)))")))
      .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("h"))
    val w = Window.partitionBy("doc_id").orderBy("p")
    val sel = grams
      .withColumn("wm", min("h").over(w.rowsBetween(0, 7)))
      .withColumn("pmax", max("p").over(Window.partitionBy("doc_id")))
      .where(col("p") + 7 <= col("pmax"))
      .select(col("doc_id"), col("wm").as("h")).distinct()
    val kept = sel.join(
      sel.groupBy("h").agg(count(lit(1)).as("nd")).where(col("nd") <= 5), "h")
    kept.as("a").join(kept.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 8)
      .orderBy("a_id", "b_id")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt69_holt_winters" -> lt69HoltWinters,
    "lt70_winnowing" -> lt70Winnowing)

  val oracleSql: Map[String, String] = Map(
    // recursive-CTE replay (the lt17 pattern) with LIST state carried
    // through the recursion; every branch's fp op order mirrors the
    // Spark fold text exactly
    "lt69_holt_winters" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
        |      / (count(*) * 1000000.0) AS v
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS INT) AS j,
        |    CAST(v AS DOUBLE) AS v
        |  FROM daily
        |  QUALIFY count(*) OVER (PARTITION BY event_type) >= 14),
        |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM idx GROUP BY 1),
        |rec AS (
        |  SELECT event_type, j, CAST(v AS DOUBLE) AS sm,
        |    CAST(0.0 AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b, [v] AS s
        |  FROM idx WHERE j = 1
        |  UNION ALL
        |  SELECT event_type, j, sm, l, b, s FROM (
        |    SELECT i.event_type, i.j,
        |      CASE WHEN r.j < 6 THEN r.sm + i.v ELSE CAST(0.0 AS DOUBLE) END AS sm,
        |      CASE WHEN r.j < 6 THEN CAST(0.0 AS DOUBLE)
        |           WHEN r.j = 6 THEN (r.sm + i.v) / 7.0
        |           ELSE 0.5 * (i.v - r.s[1]) + 0.5 * (r.l + r.b) END AS l,
        |      CASE WHEN r.j < 6 THEN CAST(0.0 AS DOUBLE)
        |           WHEN r.j = 6 THEN CAST(0.0 AS DOUBLE)
        |           ELSE 0.3 * ((0.5 * (i.v - r.s[1]) + 0.5 * (r.l + r.b)) - r.l)
        |                + 0.7 * r.b END AS b,
        |      CASE WHEN r.j < 6 THEN list_append(r.s, i.v)
        |           WHEN r.j = 6 THEN list_transform(list_append(r.s, i.v),
        |                               x -> x - (r.sm + i.v) / 7.0)
        |           ELSE list_append(r.s[2:7],
        |             0.3 * (i.v - (0.5 * (i.v - r.s[1]) + 0.5 * (r.l + r.b)))
        |             + 0.7 * r.s[1]) END AS s
        |    FROM rec r JOIN idx i ON i.event_type = r.event_type AND i.j = r.j + 1)),
        |fin AS (
        |  SELECT event_type, max_by(l, j) AS l, max_by(b, j) AS b, max_by(s, j) AS s
        |  FROM rec GROUP BY 1)
        |SELECT f.event_type, n.n_days,
        |  round(f.l, 4) AS level, round(f.b, 4) AS trend,
        |  round(f.l + 1 * f.b + f.s[1], 4) AS f1,
        |  round(f.l + 2 * f.b + f.s[2], 4) AS f2,
        |  round(f.l + 3 * f.b + f.s[3], 4) AS f3
        |FROM fin f JOIN nd n USING (event_type) ORDER BY event_type""".stripMargin,
    "lt70_winnowing" ->
      """WITH grams AS (
        |  SELECT doc_id, p, md5(substr(text, CAST(p AS INTEGER), 12)) AS h
        |  FROM (SELECT doc_id, text,
        |          unnest(generate_series(CAST(1 AS BIGINT),
        |            CAST(length(text) - 11 AS BIGINT))) AS p
        |        FROM documents WHERE length(text) >= 12)),
        |sel AS (
        |  SELECT DISTINCT doc_id, wm AS h FROM (
        |    SELECT doc_id, p,
        |      min(h) OVER (PARTITION BY doc_id ORDER BY p
        |                   ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wm,
        |      max(p) OVER (PARTITION BY doc_id) AS pmax
        |    FROM grams) WHERE p + 7 <= pmax),
        |df AS (SELECT h, count(*) AS nd FROM sel GROUP BY h),
        |kept AS (SELECT s.doc_id, s.h FROM sel s JOIN df USING (h)
        |         WHERE df.nd <= 5)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(count(*) AS BIGINT) AS shared
        |FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 8
        |ORDER BY a_id, b_id""".stripMargin)
}
