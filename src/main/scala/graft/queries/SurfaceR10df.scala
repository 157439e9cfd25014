package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.functions.VectorFunctions

/** Round-10 surface batch 110: the matryoshka truncation-fidelity
  * sweep and post-stratified experiment analysis.
  *
  * Contrast with near-siblings: lp62 measures RANDOM-PROJECTION (JL)
  * distortion — a rotation every serving stack would have to apply;
  * l18 measures PREFIX-TRUNCATION fidelity (keep the first d of 64
  * dims, store/serve d floats) — the matryoshka question asked of
  * MRL-trained embeddings, answered as exact top-10 overlap counts
  * against the full-dimension ranking per d ∈ {8,16,32,64}. l17's
  * int8 audit quantizes VALUES; l18 cuts DIMENSIONS. m189 vs m134:
  * CUPED needs a continuous PRE-PERIOD covariate and fits a slope;
  * post-stratification needs only a CATEGORICAL stratum at assignment
  * time — it reweights stratum-level arm differences by population
  * shares, the first variance-reduction step when no pre-period
  * exists (m129 checks the split itself; q23 reads the raw diff).
  *
  * Float discipline: cosines ride the same codegen kernel / DuckDB
  * list_cosine_similarity pairing l3/l4 verified (array order fixes
  * the summation order on both engines); overlaps are exact integer
  * counts. m189 keeps per-stratum cent sums exact, and the 3-term
  * post-stratified combination quantizes each w·diff to micro-cents
  * before summing (quantize-before-sum).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.7 (similarity) and §2.13 (experimentation);
  * siblings lp62/l17 (SurfaceR8-family), l4 (LlmOps), m134/m129/q23.
  */
object SurfaceR10df extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val DIMS = Seq(8, 16, 32, 64)
  private val K = 10

  /** L18: MATRYOSHKA RECALL — queries are vec_id % 67 = 0 (the l4/lpq
    * panel); for each kept-prefix width d, rank all candidates by
    * cosine on the first d dims and count the overlap with the
    * full-width top-10. One row per d: exact overlap sum and
    * recall@10.
    *
    * Scale shape: the query panel is a small fixed fraction; each
    * (query, candidate) pair is scored once per d via the codegen
    * kernel on a sliced array — at corpus scale the same sweep rides
    * the bucketed l4c route; the eval itself is the readout that
    * picks the serving width BEFORE building that index.
    */
  val l18MatryoshkaRecall: Q = (s, d) => {
    val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
    // .limit caps the probe panel explicitly: the audit's structural
    // boundedness proof for the BNLJ build side (the l17/ls6 idiom) -
    // a content no-op below sf~1.3, where the %67 panel is < 1000
    val queries = emb.where(col("vec_id") % 67 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .limit(1000)
    val pairs = broadcast(queries).join(emb.as("c"), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("c_id"),
        col("q_emb"), col("embedding").as("c_emb"))
    val perDim = DIMS.map { dim =>
      val w = Window.partitionBy("q_id")
        .orderBy(col("cos").desc, col("c_id").asc)
      pairs
        .select(col("q_id"), col("c_id"),
          VectorFunctions.cosineSim(
            slice(col("q_emb"), 1, dim), slice(col("c_emb"), 1, dim))
            .as("cos"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= K)
        .select(lit(dim.toLong).as("dim"), col("q_id"), col("c_id"))
    }.reduce(_ union _)
    val full = perDim.where(col("dim") === 64)
      .select(col("q_id"), col("c_id"))
    perDim.join(full.withColumn("hit", lit(1L)), Seq("q_id", "c_id"), "left")
      .groupBy("dim")
      .agg(countDistinct("q_id").as("n_queries"),
        sum(coalesce(col("hit"), lit(0L))).as("overlap"))
      .select(col("dim"), col("n_queries"), col("overlap"),
        r4(expr(s"CAST(overlap AS DOUBLE) / ($K * n_queries)"))
          .as("recall_at_10"))
      .orderBy("dim")
  }

  // ---- M189: post-stratification ----

  /** Arm assignment: md5 membership on the user id (survives
    * repartition/retry — the lp10 idiom). */
  private val armSql =
    "(instr('0123456789abcdef', " +
      "substr(md5(user_id || 'ps'), 1, 1)) - 1) < 8"

  /** M189: POST-STRATIFICATION — users split into md5 arms; metric =
    * per-user cent volume; strata = activity quartile tiers (doubled
    * percentiles at 0.25/0.75 — quarter fractions interpolate exactly
    * in binary, unlike 1/3). Per stratum: arm sizes,
    * means, the stratum diff and weight; repeated columns carry the
    * post-stratified diff (Σ w·diff, micro-cent-quantized before the
    * 3-term sum) next to the raw SRS diff.
    *
    * Scale shape: one per-user agg, two scalar percentile cutoffs
    * broadcast back, one stratum×arm hash agg — the full pipeline is
    * three aggregation passes over key-partitioned data.
    */
  val m189PostStratification: Q = (s, d) => {
    val users = events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("ne"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("cents"))
      .withColumn("arm", expr(s"CASE WHEN $armSql THEN 'A' ELSE 'B' END"))
    val cuts = users.agg(
      expr("CAST(percentile(2 * ne, 0.25) AS BIGINT)").as("t1"),
      expr("CAST(percentile(2 * ne, 0.75) AS BIGINT)").as("t2"))
    val tiered = users.crossJoin(broadcast(cuts))
      .withColumn("stratum",
        expr("CASE WHEN 2 * ne <= t1 THEN 'low' " +
          "WHEN 2 * ne <= t2 THEN 'mid' ELSE 'high' END"))
    val cells = tiered.groupBy("stratum")
      .agg(count(lit(1)).as("n_s"),
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === "A", col("cents")).otherwise(0L)).as("sa"),
        sum(when(col("arm") === "B", col("cents")).otherwise(0L)).as("sb"))
    val tot = cells.agg(sum("n_s").as("n_tot"),
      sum("n_a").as("na_tot"), sum("n_b").as("nb_tot"),
      sum("sa").as("sa_tot"), sum("sb").as("sb_tot"))
    val terms = cells.crossJoin(broadcast(tot))
      .withColumn("diff_s",
        expr("CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b"))
      .withColumn("w", expr("CAST(n_s AS DOUBLE) / n_tot"))
      .withColumn("wq",
        expr("CAST(floor(w * diff_s * 1e6 + 0.5) AS BIGINT)"))
    val ps = terms.agg(sum("wq").as("psq"))
    terms.crossJoin(broadcast(ps))
      .select(col("stratum"), col("n_a"), col("n_b"),
        r4(expr("CAST(sa AS DOUBLE) / n_a")).as("mean_a"),
        r4(expr("CAST(sb AS DOUBLE) / n_b")).as("mean_b"),
        r4(col("w")).as("w"),
        r4(col("diff_s")).as("diff_s"),
        r4(expr("CAST(psq AS DOUBLE) / 1e6")).as("ps_diff"),
        r4(expr("CAST(sa_tot AS DOUBLE) / na_tot - " +
          "CAST(sb_tot AS DOUBLE) / nb_tot")).as("srs_diff"))
      .orderBy("stratum")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "l18_matryoshka_recall" -> l18MatryoshkaRecall,
    "m189_post_stratification" -> m189PostStratification)

  val oracleSql: Map[String, String] = Map(
    "l18_matryoshka_recall" ->
      s"""WITH emb AS MATERIALIZED (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |queries AS MATERIALIZED (
        |  SELECT vec_id AS q_id, e AS qe FROM emb WHERE vec_id % 67 = 0
        |  LIMIT 1000),
        |dims AS (SELECT CAST(unnest([8, 16, 32, 64]) AS BIGINT) AS dim),
        |ranked AS MATERIALIZED (
        |  SELECT dim, q_id, c_id FROM (
        |    SELECT d.dim, q.q_id, c.vec_id AS c_id,
        |      row_number() OVER (PARTITION BY d.dim, q.q_id
        |        ORDER BY list_cosine_similarity(
        |          list_slice(q.qe, 1, CAST(d.dim AS INT)),
        |          list_slice(c.e, 1, CAST(d.dim AS INT))) DESC,
        |          c.vec_id ASC) AS rn
        |    FROM queries q JOIN emb c ON c.vec_id <> q.q_id
        |    CROSS JOIN dims d)
        |  WHERE rn <= $K),
        |full_ AS (SELECT q_id, c_id FROM ranked WHERE dim = 64)
        |SELECT r.dim, CAST(count(DISTINCT r.q_id) AS BIGINT) AS n_queries,
        |  CAST(sum(CASE WHEN f.c_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS overlap,
        |  round(CAST(sum(CASE WHEN f.c_id IS NOT NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) / ($K * count(DISTINCT r.q_id)), 4) AS recall_at_10
        |FROM ranked r LEFT JOIN full_ f
        |  ON f.q_id = r.q_id AND f.c_id = r.c_id
        |GROUP BY r.dim ORDER BY r.dim""".stripMargin,
    "m189_post_stratification" ->
      s"""WITH users AS MATERIALIZED (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS ne,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents,
        |    CASE WHEN $armSql THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY 1),
        |cuts AS (
        |  SELECT CAST(quantile_cont(2 * ne, 0.25) AS BIGINT) AS t1,
        |    CAST(quantile_cont(2 * ne, 0.75) AS BIGINT) AS t2
        |  FROM users),
        |tiered AS (
        |  SELECT u.*, CASE WHEN 2 * ne <= t1 THEN 'low'
        |    WHEN 2 * ne <= t2 THEN 'mid' ELSE 'high' END AS stratum
        |  FROM users u CROSS JOIN cuts),
        |cells AS MATERIALIZED (
        |  SELECT stratum, CAST(count(*) AS BIGINT) AS n_s,
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN arm = 'A' THEN cents ELSE 0 END) AS BIGINT)
        |      AS sa,
        |    CAST(sum(CASE WHEN arm = 'B' THEN cents ELSE 0 END) AS BIGINT)
        |      AS sb
        |  FROM tiered GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_s) AS BIGINT) AS n_tot,
        |    CAST(sum(n_a) AS BIGINT) AS na_tot,
        |    CAST(sum(n_b) AS BIGINT) AS nb_tot,
        |    CAST(sum(sa) AS BIGINT) AS sa_tot,
        |    CAST(sum(sb) AS BIGINT) AS sb_tot
        |  FROM cells),
        |terms AS MATERIALIZED (
        |  SELECT c.*, t.n_tot, t.na_tot, t.nb_tot, t.sa_tot, t.sb_tot,
        |    CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b AS diff_s,
        |    CAST(n_s AS DOUBLE) / t.n_tot AS w,
        |    CAST(floor((CAST(n_s AS DOUBLE) / t.n_tot) *
        |      (CAST(sa AS DOUBLE) / n_a - CAST(sb AS DOUBLE) / n_b) * 1e6
        |      + 0.5) AS BIGINT) AS wq
        |  FROM cells c CROSS JOIN tot t),
        |ps AS (SELECT CAST(sum(wq) AS BIGINT) AS psq FROM terms)
        |SELECT stratum, n_a, n_b,
        |  round(CAST(sa AS DOUBLE) / n_a, 4) AS mean_a,
        |  round(CAST(sb AS DOUBLE) / n_b, 4) AS mean_b,
        |  round(w, 4) AS w,
        |  round(diff_s, 4) AS diff_s,
        |  round(CAST(psq AS DOUBLE) / 1e6, 4) AS ps_diff,
        |  round(CAST(sa_tot AS DOUBLE) / na_tot -
        |    CAST(sb_tot AS DOUBLE) / nb_tot, 4) AS srs_diff
        |FROM terms CROSS JOIN ps
        |ORDER BY stratum""".stripMargin)
}
