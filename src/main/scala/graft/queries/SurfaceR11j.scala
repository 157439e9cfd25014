package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-11 surface batch 10: the Theta method — the M3-competition
  * benchmark forecaster.
  *
  * Contrast with near-siblings: t15 EWMA smooths level only, lt17
  * Holt adds a RECURSIVE trend, lt69 Holt–Winters adds seasonality —
  * the Theta method (Assimakopoulos & Nikolopoulos 2000) instead
  * DECOMPOSES by curvature: the θ=0 line is the fitted linear trend,
  * the θ=2 line doubles the local curvature (2x − trend) and is
  * smoothed by SES; the forecast is their average. Its entire skill
  * comes from that split, not from a state recursion — which is why it
  * beat exponential-smoothing variants at M3 while being this simple.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.13 (time-series ops).
  */
object SurfaceR11j extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** LT77: THETA METHOD FORECAST per event type's daily-mean series —
    * (1) daily means quantized to the 1e-6 grid, so the OLS trend's
    * moment sums are EXACT integers (Sx, Sxx over j are integers;
    * Sy, Sxy over the quantized values are integers) and slope /
    * intercept are single divisions; (2) the θ=2 line
    * t_j = 2·v_j − (a + b·j) per row; (3) SES with α = 0.5 over the
    * date-ordered θ=2 line as an `aggregate` fold, replayed by the
    * oracle as the lt17-style RECURSIVE CTE in identical fp op order;
    * (4) forecast x̂(n+h) = (ses + (a + b·(n+h))) / 2 for h = 1..3.
    * Scale: one bounded fold per group over a days-bounded series; the
    * daily pre-agg is the distributed pass. */
  val lt77Theta: Q = (s, d) => {
    // Per-row values quantized to the 1e-6 grid BEFORE the daily mean:
    // qv = round(sum(quantized)/count) is an exact-integer-seeded
    // division, identical cross-engine, where floor(avg(value)·1e6+0.5)
    // on a raw avg sits one ulp from flipping (ADVICE r11, lt71 class).
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(floor(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))" +
        " AS DOUBLE) / count(*) + 0.5) AS BIGINT)").as("qv"))
    // ordinal j by day: collect the sorted series and fold — j is the
    // array position, so no window is needed at all
    val folded = daily
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("qv")))).as("sv"),
        count(lit(1)).as("n_days"))
      .where(col("n_days") >= 4)
      .select(col("event_type"), col("n_days"), col("sv"),
        // exact-integer OLS moments over (j, qv): j = 1..n
        expr("""aggregate(sv,
            named_struct('j', CAST(0 AS BIGINT), 'sy', CAST(0 AS BIGINT),
              'sxy', CAST(0 AS BIGINT)),
            (acc, x) -> named_struct('j', acc.j + 1,
              'sy', acc.sy + x.qv,
              'sxy', acc.sxy + (acc.j + 1) * x.qv))""").as("m"))
      .select(col("event_type"), col("n_days"), col("sv"),
        col("m.sy").as("sy"), col("m.sxy").as("sxy"),
        (col("n_days") * (col("n_days") + 1) / 2).as("sx"),
        (col("n_days") * (col("n_days") + 1) * (col("n_days") * 2 + 1) / 6)
          .as("sxx"))
      .select(col("event_type"), col("n_days"), col("sv"),
        // slope/intercept in original units: one division each
        (((col("n_days") * col("sxy") - col("sx") * col("sy"))
          .cast("double") / (col("n_days") * col("sxx") - col("sx") * col("sx"))
          .cast("double")) / 1000000.0d).as("b"),
        col("sy"), col("sx"))
      .select(col("event_type"), col("n_days"), col("sv"), col("b"),
        (col("sy").cast("double") / (col("n_days") * 1000000.0d)
          - col("b") * (col("sx").cast("double") / col("n_days"))).as("a"))
      .select(col("event_type"), col("n_days"), col("a"), r4(col("b")).as("slope"),
        col("b"),
        // SES(0.5) over the theta2 line 2*v - (a + b*j), j from the fold
        expr("""aggregate(sv,
            named_struct('j', CAST(0 AS BIGINT), 'l', CAST(0.0 AS DOUBLE)),
            (acc, x) -> named_struct('j', acc.j + 1,
              'l', CASE WHEN acc.j = 0
                THEN 2 * (CAST(x.qv AS DOUBLE) / 1000000) - (a + b * 1)
                ELSE 0.5 * (2 * (CAST(x.qv AS DOUBLE) / 1000000)
                       - (a + b * (acc.j + 1))) + 0.5 * acc.l END))""")
          .getField("l").as("ses"))
    folded.select(col("event_type"), col("n_days"), col("slope"),
        r4(col("ses")).as("ses_level"),
        r4((col("ses") + (col("a") + col("b") * (col("n_days") + 1))) / 2.0d).as("f1"),
        r4((col("ses") + (col("a") + col("b") * (col("n_days") + 2))) / 2.0d).as("f2"),
        r4((col("ses") + (col("a") + col("b") * (col("n_days") + 3))) / 2.0d).as("f3"))
      .orderBy("event_type")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt77_theta" -> lt77Theta)

  val oracleSql: Map[String, String] = Map(
    "lt77_theta" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    CAST(floor(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
        |      AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS qv
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, qv,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS j
        |  FROM daily
        |  QUALIFY count(*) OVER (PARTITION BY event_type) >= 4),
        |mom AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(qv) AS BIGINT) AS sy, CAST(sum(j * qv) AS BIGINT) AS sxy,
        |    CAST(count(*) * (count(*) + 1) / 2 AS BIGINT) AS sx,
        |    CAST(count(*) * (count(*) + 1) * (2 * count(*) + 1) / 6 AS BIGINT) AS sxx
        |  FROM idx GROUP BY 1),
        |ab AS (
        |  SELECT event_type, n,
        |    (CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE)) / 1000000.0 AS b,
        |    sy, sx
        |  FROM mom),
        |ab2 AS (
        |  SELECT event_type, n, b,
        |    CAST(sy AS DOUBLE) / (n * 1000000.0)
        |      - b * (CAST(sx AS DOUBLE) / n) AS a
        |  FROM ab),
        |rec AS (
        |  SELECT i.event_type, i.j,
        |    2 * (CAST(i.qv AS DOUBLE) / 1000000) - (p.a + p.b * 1) AS l
        |  FROM idx i JOIN ab2 p USING (event_type) WHERE i.j = 1
        |  UNION ALL
        |  SELECT i.event_type, i.j,
        |    0.5 * (2 * (CAST(i.qv AS DOUBLE) / 1000000)
        |      - (p.a + p.b * i.j)) + 0.5 * r.l
        |  FROM rec r
        |  JOIN idx i ON i.event_type = r.event_type AND i.j = r.j + 1
        |  JOIN ab2 p ON p.event_type = r.event_type),
        |fin AS (SELECT event_type, max_by(l, j) AS ses FROM rec GROUP BY 1)
        |SELECT p.event_type, p.n AS n_days, round(p.b, 4) AS slope,
        |  round(f.ses, 4) AS ses_level,
        |  round((f.ses + (p.a + p.b * (p.n + 1))) / 2.0, 4) AS f1,
        |  round((f.ses + (p.a + p.b * (p.n + 2))) / 2.0, 4) AS f2,
        |  round((f.ses + (p.a + p.b * (p.n + 3))) / 2.0, 4) AS f3
        |FROM ab2 p JOIN fin f USING (event_type)
        |ORDER BY event_type""".stripMargin)
}
