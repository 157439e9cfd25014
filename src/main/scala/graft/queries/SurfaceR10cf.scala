package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 84: HITS hubs/authorities over the directed
  * kNN graph, and the KPSS level-stationarity test on daily series.
  *
  * Contrast with near-siblings: lg_pagerank ranks by a SINGLE damped
  * random-walk score over the symmetrized graph (and is a law-spec
  * entry — float damping breaks cross-engine hashing); HITS is the
  * mutual-recursion pair on the DIRECTED relation — a vertex is a good
  * authority when good hubs point AT it, a good hub when it points at
  * good authorities — and the kNN graph is genuinely asymmetric
  * (out-degree pinned at 3, in-degree skewed toward hubs), so the two
  * scores separate "popular neighbor" from "well-connected prober" in
  * a way PageRank's one score cannot. lt36 (Ljung–Box) tests serial
  * CORRELATION at fixed lags and m123 (Mann–Kendall) tests monotone
  * trend; KPSS tests the null of LEVEL-STATIONARITY via partial-sum
  * energy — a series can pass both LB-independence and MK-no-trend yet
  * fail KPSS (a one-step level shift), which is exactly the drift mode
  * a daily-ingest monitor needs.
  *
  * Float discipline: HITS runs UNNORMALIZED in pure BIGINT for 4
  * rounds (bounded: scores grow like (d_in·d_out)^4 ≪ 2^63 here; at
  * larger depth/degree, right-shift scores between rounds), with the
  * max-normalized readout the only division. KPSS uses the lt36
  * n-scaling idiom: u_t = n·x_t − S is an exact integer, its running
  * sum is the n-scaled partial sum, and η = ΣS'² / (n·Σu²) is one
  * exact-integer ratio — no float mean, no float accumulation.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.9 (similarity-graph ops) and §2.13 (drift tests);
  * siblings lg_pagerank (SurfaceR6c), lt36/m121 (SurfaceR10an).
  */
object SurfaceR10cf extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val ROUNDS = 4 // HITS power-iteration rounds (integer-exact)

  /** LG9: HITS — 4 unnormalized integer rounds of a ⟵ Aᵀh, h ⟵ Aa over
    * the directed 3-NN relation, then the top-15 vertices by authority
    * with max-normalized double readouts.
    *
    * Scale shape: each half-round is one equi-join on an integer vertex
    * id + one map-side-combinable hash agg; ROUNDS is fixed so the plan
    * is a bounded chain, with eager localCheckpoints truncating lineage
    * (cluster: checkpoint to DFS). At 100 TB the same loop runs over
    * LSH/IVF candidate edges; pre-partition edges and scores by vertex
    * to co-locate every iteration's join.
    */
  val lg9Hits: Q = (s, d) => {
    val e = SurfaceR6h.knnDirected(s, d).localCheckpoint(true)
    val verts = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().localCheckpoint(true)

    var h = verts.select(col("v"), lit(1L).as("h"))
    var a = verts.limit(0).select(col("v"), lit(1L).as("a")) // replaced below
    for (_ <- 1 to ROUNDS) {
      a = e.join(h.select(col("v").as("hv"), col("h")), col("src") === col("hv"))
        .groupBy(col("dst").as("v")).agg(sum("h").as("a"))
        .localCheckpoint(true)
      h = e.join(a.select(col("v").as("av"), col("a")), col("dst") === col("av"))
        .groupBy(col("src").as("v")).agg(sum("a").as("h"))
        .localCheckpoint(true)
    }
    val fin = verts
      .join(a.select(col("v").as("av"), col("a")), col("v") === col("av"), "left")
      .join(h.select(col("v").as("hv"), col("h")), col("v") === col("hv"), "left")
      .select(col("v"), coalesce(col("a"), lit(0L)).as("auth"),
        coalesce(col("h"), lit(0L)).as("hub"))
    val mx = fin.agg(max("auth").as("ma"), max("hub").as("mh"))
    fin.crossJoin(broadcast(mx))
      .select(col("v").as("vec_id"), col("auth"), col("hub"),
        r4(expr("CAST(auth AS DOUBLE) / ma")).as("auth_norm"),
        r4(expr("CAST(hub AS DOUBLE) / mh")).as("hub_norm"))
      .orderBy(col("auth").desc, col("vec_id").asc)
      .limit(15)
  }

  /** LT51: KPSS — per event_type over the daily event-count series,
    * η = (1/n²)·ΣₜSₜ²/s² with Sₜ the partial sums of the centered
    * series and s² the lag-0 variance (no HAC bandwidth — stated, so
    * the statistic is exact; with serial correlation present, compare
    * against lt36 before reading the 0.463 five-percent line as a
    * calibrated test). Everything up to the final ratio is BIGINT:
    * u_t = n·x_t − S, S'_t = Σ_{i≤t}u_i, η = ΣS'² / (n·Σu²).
    *
    * Scale shape: facts → per-(type,day) hash agg; the running sum is
    * a per-type window over a calendar-bounded series (≤ #days rows
    * per type no matter the corpus size). S'_n = 0 by construction —
    * the spec's conservation law.
    */
  val lt51Kpss: Q = (s, d) => {
    val daily = events(s, d)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("x"))
    val cells = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val u = daily.join(broadcast(cells), "event_type")
      .select(col("event_type"), col("day"), col("n"),
        (col("n") * col("x") - col("sx")).as("u"))
    val w = Window.partitionBy("event_type").orderBy("day")
    u.withColumn("sc", sum(col("u")).over(w))
      .groupBy("event_type", "n")
      .agg(sum(expr("sc * sc")).as("num"), sum(expr("u * u")).as("den"))
      .select(col("event_type"), col("n").as("n_days"),
        r4(expr("CAST(num AS DOUBLE) / (n * den)")).as("kpss_eta"),
        expr("CAST(num AS DOUBLE) / (n * den) > 0.463").as("reject_5pct"))
      .orderBy("event_type")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lg9_hits" -> lg9Hits,
    "lt51_kpss" -> lt51Kpss)

  /** Unrolled HITS rounds: a1,h1..a4,h4 CTEs generated from the same
    * ROUNDS constant as the Spark loop so the two cannot drift. Every
    * multiply-referenced CTE is `AS MATERIALIZED` — DuckDB inlines
    * plain CTEs, and with fin referencing both a4 and h4 (and each h_i
    * referencing a_i) the O(n²) kNN subquery would otherwise re-expand
    * 2^ROUNDS times (the lg8 OOM lesson). */
  private def hitsSql: String = {
    val edges = SurfaceR6h.knnEdgesCte
      .replace("knn AS (", "knn AS MATERIALIZED (")
    val header =
      s"""WITH $edges,
         |verts AS MATERIALIZED (SELECT DISTINCT v FROM (
         |  SELECT s AS v FROM knn UNION ALL SELECT t AS v FROM knn)),
         |h0 AS MATERIALIZED (SELECT v, CAST(1 AS BIGINT) AS h FROM verts)""".stripMargin
    val rounds = (1 to ROUNDS).map { i =>
      s"""a$i AS MATERIALIZED (
         |  SELECT t AS v, CAST(sum(h) AS BIGINT) AS a
         |  FROM knn JOIN h${i - 1} ON knn.s = h${i - 1}.v GROUP BY t),
         |h$i AS MATERIALIZED (
         |  SELECT s AS v, CAST(sum(a) AS BIGINT) AS h
         |  FROM knn JOIN a$i ON knn.t = a$i.v GROUP BY s)""".stripMargin
    }.mkString(",\n")
    s"""$header,
       |$rounds,
       |fin AS (
       |  SELECT verts.v, coalesce(a$ROUNDS.a, 0) AS auth,
       |    coalesce(h$ROUNDS.h, 0) AS hub
       |  FROM verts LEFT JOIN a$ROUNDS ON verts.v = a$ROUNDS.v
       |  LEFT JOIN h$ROUNDS ON verts.v = h$ROUNDS.v),
       |mx AS (SELECT max(auth) AS ma, max(hub) AS mh FROM fin)
       |SELECT v AS vec_id, CAST(auth AS BIGINT) AS auth,
       |  CAST(hub AS BIGINT) AS hub,
       |  round(CAST(auth AS DOUBLE) / ma, 4) AS auth_norm,
       |  round(CAST(hub AS DOUBLE) / mh, 4) AS hub_norm
       |FROM fin CROSS JOIN mx
       |ORDER BY auth DESC, vec_id LIMIT 15""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "lg9_hits" -> hitsSql,
    "lt51_kpss" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |cells AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx
        |  FROM daily GROUP BY 1),
        |u AS (
        |  SELECT d.event_type, d.day, c.n, c.n * d.x - c.sx AS u
        |  FROM daily d JOIN cells c USING (event_type)),
        |sc AS (
        |  SELECT event_type, n, u,
        |    CAST(sum(u) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT)
        |      AS sc
        |  FROM u),
        |agg AS (
        |  SELECT event_type, n,
        |    CAST(sum(sc * sc) AS BIGINT) AS num,
        |    CAST(sum(u * u) AS BIGINT) AS den
        |  FROM sc GROUP BY 1, 2)
        |SELECT event_type, n AS n_days,
        |  round(CAST(num AS DOUBLE) / (n * den), 4) AS kpss_eta,
        |  CAST(num AS DOUBLE) / (n * den) > 0.463 AS reject_5pct
        |FROM agg ORDER BY event_type""".stripMargin)
}
