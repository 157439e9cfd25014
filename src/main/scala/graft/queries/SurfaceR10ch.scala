package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 86: CRPS ensemble-forecast scoring against a
  * trailing climatology, and Burrows' Delta stylometric distance
  * between sources.
  *
  * Contrast with near-siblings: lt39 (MASE) and m102 (Brier) score a
  * POINT forecast and a binary PROBABILITY respectively; CRPS is the
  * proper scoring rule for a full predictive DISTRIBUTION — here the
  * empirical 7-day trailing ensemble — and reduces to MAE when the
  * ensemble collapses to a point, so the two are directly comparable
  * on the same units. lt44 (Monroe log-odds) and lt33 rank TERMS that
  * distinguish one source; Burrows' Delta is the SOURCE-PAIR distance
  * in standardized style space — mean |Δz| of per-10k-token rates over
  * the shared top vocabulary — the classical authorship-attribution
  * measure (a small Delta between two "different" sources is a
  * provenance-mixup signal).
  *
  * Float discipline: CRPS with an m-member integer ensemble is exact —
  * per day, num = m·Σᵢ|xᵢ−y| − Σ_{i<j}|xᵢ−xⱼ| is a BIGINT and the
  * statistic is Σnum/(m²·T); both engines evaluate the same generated
  * absolute-difference terms. Delta uses the m121 quantization idiom:
  * per-10k rates are exact integer divisions, z = (S·R−ΣR)/√(S·ΣR²−
  * (ΣR)²) is one shared closed form, quantized to 1e-4 BIGINTs BEFORE
  * the cross-source sum so no raw float is ever accumulated.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.13 (forecast eval) and §2.9 (text analysis); siblings
  * lt39/m102 (forecast family), lt44/lt42 (stylometry family).
  */
object SurfaceR10ch extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val M = 7  // ensemble size: the 7 trailing days
  private val K = 30 // Delta vocabulary: top-30 corpus terms

  // Generated once, embedded in BOTH the Spark expr and the oracle SQL
  // so the term lists cannot drift.
  private val crpsT1 = (1 to M).map(i => s"abs(l$i - x)").mkString(" + ")
  private val crpsT2 = (for { i <- 1 until M; j <- i + 1 to M }
    yield s"abs(l$i - l$j)").mkString(" + ")
  private val crpsNum = s"($M * ($crpsT1) - ($crpsT2))"

  /** LT53: CRPS — per event_type, each day's count y is scored against
    * the empirical distribution of the 7 preceding days' counts (the
    * positional trailing climatology): CRPS = (1/m)Σ|xᵢ−y| −
    * (1/m²)Σ_{i<j}|xᵢ−xⱼ|. Reported as the per-type mean alongside the
    * persistence MAE (|x₁−y|, the same-units point baseline): an
    * ensemble that beats persistence has crps_mean < mae_naive.
    *
    * Scale shape: facts → per-(type,day) hash agg; the 7 lags are one
    * window over the calendar-bounded per-type series; the 49 abs
    * terms are codegen'd projections. Day count is calendar-bounded,
    * so everything after the first agg is O(#types·#days).
    */
  val lt53Crps: Q = (s, d) => {
    val daily = events(s, d)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val lagged = (1 to M).foldLeft(daily) { (df, i) =>
      df.withColumn(s"l$i", lag(col("x"), i).over(w))
    }.where(col(s"l$M").isNotNull)
    lagged
      .select(col("event_type"), expr(crpsNum).as("num"),
        expr("abs(l1 - x)").as("ae1"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_scored"),
        sum("num").as("snum"), sum("ae1").as("sae"))
      .select(col("event_type"), col("n_scored"),
        r4(expr(s"CAST(snum AS DOUBLE) / (${M * M} * n_scored)"))
          .as("crps_mean"),
        r4(expr("CAST(sae AS DOUBLE) / n_scored")).as("mae_naive"))
      .orderBy("event_type")
  }

  // z numerator/denominator over S sources from exact integer rate
  // moments: z = (S·r − sr) / sqrt(S·srr − sr²).
  private val dzQ =
    "CAST(floor((ns * r - sr) / sqrt(ns * srr - CAST(sr AS DOUBLE) * sr) * 1e4 + 0.5) AS BIGINT)"

  /** LT54: BURROWS' DELTA — token rates per 10k for the corpus-wide
    * top-30 vocabulary, standardized across sources, then
    * Delta(a,b) = mean |z_a − z_b| for every source pair. Rates use
    * exact integer division; z is quantized to 1e-4 BIGINTs before
    * the pairwise sum (the m121 residual idiom). Zero-variance terms
    * are excluded by the same integer predicate on both engines.
    *
    * Scale shape: explode → (source,term) hash agg is the only
    * data-scaling stage; the vocabulary (top-K broadcast), the
    * S×K grid, and the S²·K pair join are all bounded.
    */
  val lt54BurrowsDelta: Q = (s, d) => {
    val tok = documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
    val tot = tok.groupBy("source").agg(count(lit(1)).as("tot"))
    val cnt = tok.groupBy("source", "term").agg(count(lit(1)).as("c"))
    val top = cnt.groupBy("term").agg(sum("c").as("tc"))
      .orderBy(col("tc").desc, col("term").asc).limit(K)
      .select("term")
    val grid = tot.crossJoin(broadcast(top))
      .join(cnt, Seq("source", "term"), "left")
      .select(col("source"), col("term"),
        expr("coalesce(c, 0) * 10000 DIV tot").as("r"))
    val stats = grid.groupBy("term")
      .agg(count(lit(1)).as("ns"), sum("r").as("sr"),
        sum(expr("r * r")).as("srr"))
      .where(expr("ns * srr - sr * sr > 0"))
    val z = grid.join(broadcast(stats), "term")
      .select(col("source"), col("term"), expr(dzQ).as("zq"))
    val a = z.select(col("source").as("source_a"), col("term"),
      col("zq").as("za"))
    val b = z.select(col("source").as("source_b"), col("term"),
      col("zq").as("zb"))
    a.join(b, Seq("term")).where(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_terms"),
        sum(expr("abs(za - zb)")).as("sdz"))
      .select(col("source_a"), col("source_b"), col("n_terms"),
        r4(expr("CAST(sdz AS DOUBLE) / (n_terms * 1e4)")).as("delta"))
      .orderBy("source_a", "source_b")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt53_crps" -> lt53Crps,
    "lt54_burrows_delta" -> lt54BurrowsDelta)

  private val crpsLagsSql = (1 to M).map(i =>
    s"lag(x, $i) OVER (PARTITION BY event_type ORDER BY day) AS l$i")
    .mkString(",\n    ")

  val oracleSql: Map[String, String] = Map(
    "lt53_crps" ->
      s"""WITH daily AS (
         |  SELECT event_type,
         |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
         |    CAST(count(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1, 2),
         |lagged AS (
         |  SELECT event_type, x,
         |    $crpsLagsSql
         |  FROM daily),
         |scored AS (
         |  SELECT event_type, $crpsNum AS num, abs(l1 - x) AS ae1
         |  FROM lagged WHERE l$M IS NOT NULL)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
         |  round(CAST(sum(num) AS DOUBLE) / (${M * M} * count(*)), 4)
         |    AS crps_mean,
         |  round(CAST(sum(ae1) AS DOUBLE) / count(*), 4) AS mae_naive
         |FROM scored GROUP BY 1 ORDER BY event_type""".stripMargin,
    "lt54_burrows_delta" ->
      s"""WITH tok AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS tot
         |  FROM tok GROUP BY 1),
         |cnt AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
         |  FROM tok GROUP BY 1, 2),
         |top AS (
         |  SELECT term FROM (
         |    SELECT term, CAST(sum(c) AS BIGINT) AS tc FROM cnt GROUP BY 1)
         |  ORDER BY tc DESC, term LIMIT $K),
         |grid AS (
         |  SELECT tot.source, top.term,
         |    coalesce(cnt.c, 0) * 10000 // tot AS r
         |  FROM tot CROSS JOIN top
         |  LEFT JOIN cnt ON cnt.source = tot.source AND cnt.term = top.term),
         |stats AS (
         |  SELECT term, CAST(count(*) AS BIGINT) AS ns,
         |    CAST(sum(r) AS BIGINT) AS sr,
         |    CAST(sum(r * r) AS BIGINT) AS srr
         |  FROM grid GROUP BY 1
         |  HAVING CAST(count(*) AS BIGINT) * CAST(sum(r * r) AS BIGINT)
         |    - CAST(sum(r) AS BIGINT) * CAST(sum(r) AS BIGINT) > 0),
         |z AS (
         |  SELECT grid.source, grid.term, $dzQ AS zq
         |  FROM grid JOIN stats ON grid.term = stats.term)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  CAST(count(*) AS BIGINT) AS n_terms,
         |  round(CAST(sum(abs(a.zq - b.zq)) AS DOUBLE)
         |    / (count(*) * 1e4), 4) AS delta
         |FROM z a JOIN z b ON a.term = b.term AND a.source < b.source
         |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin)
}
