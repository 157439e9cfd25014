package graft.queries

import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-6 corpus-analysis additions: chunk-level exact dedup (the
  * C4-style "dedup below document granularity" pass), one-pass vector
  * moment statistics over the embedding corpus, and a join-based
  * PageRank over the near-dup candidate graph (the centrality signal
  * used to pick canonical representatives in a dup cluster).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.10 (LLM pipeline), §2.11 (ML stats).
  */
object SurfaceR6c extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LP12: chunk-level exact dedup ----

  /** LP12: sub-document dedup — split each document into non-overlapping
    * 3-word chunks, keep only the globally-first occurrence of each
    * distinct chunk (ordered by doc_id, position), report per-document
    * survival. One explode + one window over the chunk hash — the
    * partition key IS the chunk, so at 100 TB this shuffles once by
    * chunk (heavy chunks are the skew hazard; salt or pre-hash-bucket
    * them) and never materializes a cross-doc join. Chunk width is
    * corpus-tuned as in l13 (3 keeps ~19% dups on the fixtures; real
    * text uses lines or paragraphs).
    */
  val lp12ChunkDedup: Q = (s, d) => {
    val ch = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, size(w) - 3, 3), i -> array_join(slice(w, i + 1, 3), ' '))")))
      .withColumnsRenamed(Map("pos" -> "i", "col" -> "chunk"))
    val rn = row_number().over(
      Window.partitionBy("chunk").orderBy("doc_id", "i"))
    ch.withColumn("rn", rn)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dropped"))
      .orderBy("doc_id")
  }

  // ---- M19: one-pass vector statistics ----

  /** M19: per-dimension mean/variance over the 64-dim embedding corpus
    * via ml.stat.Summarizer — ONE distributed pass accumulating a
    * fixed-size moment sketch per partition (no shuffle of vectors, the
    * merge is sketch-sized), then a 64-row explode of the result. This
    * is the feature-normalization precursor (fit the scaler statistics)
    * and is the shape that survives 100 TB: cost ∝ one scan, state ∝
    * dimensions.
    */
  val m19VectorStats: Q = (s, d) =>
    embeddings(s, d)
      .select(array_to_vector(col("embedding")).as("v"))
      .select(
        vector_to_array(Summarizer.mean(col("v"))).as("m"),
        vector_to_array(Summarizer.variance(col("v"))).as("va"))
      .select(posexplode(arrays_zip(col("m"), col("va"))))
      .select(col("pos").cast("long").as("dim"),
        r4(col("col.m")).as("mean"), r4(col("col.va")).as("variance"))
      .orderBy("dim")

  // ---- LG: PageRank over the near-dup candidate graph ----

  /** Number of damped PageRank sweeps; the oracle unrolls exactly this
    * many CTE rounds, so the two can only move together. */
  private val PR_ROUNDS = 10

  /** LG: join-based PageRank (d = 0.85, [[PR_ROUNDS]] iterations) over
    * the md5 MinHash-banding candidate graph (PipelineOps.
    * md5BandCandidates — the SAME edge set the oracle-checked l2b row
    * emits), symmetrized — the centrality signal for choosing a cluster's
    * canonical document. Each iteration is one equi-join + one
    * aggregation on doc_id (two shuffles), so 10 iterations = a fixed
    * pipeline of 20 shuffles regardless of corpus size. Each iteration
    * is pinned with an EAGER `localCheckpoint` (the operators/
    * Components.scala idiom; on a cluster: `checkpoint` to DFS) so plan
    * depth stays constant instead of growing 10 joins deep; at 100 TB
    * additionally pre-partition ranks and edges on doc_id so the join
    * side of every iteration is co-located.
    *
    * Float discipline (this row was `no_oracle` through round 10; the
    * VERDICT r10 asked for the exact-replay flip): ranks live in exact
    * BIGINT micro-units (1.0 → 1_000_000), each per-edge contribution is
    * round-half-up integer division c = (2·rq + deg) div (2·deg), and the
    * damped update is rq' = 150000 + (17·inflow + 10) div 20 — identical
    * integer ops on both engines, so summation order cannot perturb a
    * single bit and the DuckDB replay hash-matches. Integer headroom:
    * 17·inflow stays < 2⁶³ up to ~5·10¹⁷ micro-units of total rank mass
    * (≈ 5·10¹¹ documents).
    */
  val lgPagerank: Q = (s, d) => {
    val nodes = documents(s, d).select(col("doc_id")).localCheckpoint(true)
    val cand = PipelineOps.md5BandCandidates(s, d)
    val edges = cand.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(cand.select(col("b_id").as("src"), col("a_id").as("dst")))
      .localCheckpoint(true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = nodes.select(col("doc_id"), lit(1000000L).as("rq"))
    for (_ <- 1 to PR_ROUNDS) {
      val contrib = edges.join(ranks, edges("src") === ranks("doc_id"))
        .join(deg, "src")
        .select(col("dst"),
          expr("(rq * 2 + deg) div (deg * 2)").as("c"))
        .groupBy("dst").agg(sum("c").as("inflow"))
      // eager localCheckpoint: constant plan depth across iterations
      ranks = nodes.join(contrib, nodes("doc_id") === contrib("dst"), "left")
        .select(nodes("doc_id"),
          expr("CAST(150000 + (coalesce(inflow, CAST(0 AS BIGINT)) * 17 + 10)" +
            " div 20 AS BIGINT)").as("rq"))
        .localCheckpoint(true)
    }
    ranks.select(col("doc_id"), col("rq").as("rank_micro"),
        r4(col("rq").cast("double") / lit(1000000L)).as("rank"))
      .orderBy("doc_id")
  }

  /** Unrolled integer-PageRank rounds for the oracle: identical
    * round-half-up integer divisions as the Spark loop. Every CTE is
    * MATERIALIZED — each round references its predecessor plus the
    * shared edge set, and DuckDB would otherwise re-expand the whole
    * banding pipeline per round (the lg8 OOM lesson). */
  private def prRoundsSql(k: Int): String =
    (0 until k).map { i =>
      s"""inf$i AS MATERIALIZED (
         |  SELECT sym.dst AS doc_id,
         |    CAST(sum((r.rq * 2 + dg.deg) // (dg.deg * 2)) AS BIGINT) AS inflow
         |  FROM sym JOIN r$i r ON r.doc_id = sym.src
         |  JOIN dg ON dg.src = sym.src
         |  GROUP BY 1),
         |r${i + 1} AS MATERIALIZED (
         |  SELECT n.doc_id,
         |    CAST(150000 + (coalesce(f.inflow, 0) * 17 + 10) // 20 AS BIGINT)
         |      AS rq
         |  FROM nodes n LEFT JOIN inf$i f ON f.doc_id = n.doc_id)""".stripMargin
    }.mkString(",\n")

  private def pagerankSql: String =
    s"""WITH ${PipelineOps.md5CandCteSql(mat = true)},
       |nodes AS MATERIALIZED (SELECT doc_id FROM documents),
       |sym AS MATERIALIZED (
       |  SELECT a_id AS src, b_id AS dst FROM cand
       |  UNION ALL SELECT b_id AS src, a_id AS dst FROM cand),
       |dg AS MATERIALIZED (
       |  SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
       |r0 AS MATERIALIZED (
       |  SELECT doc_id, CAST(1000000 AS BIGINT) AS rq FROM nodes),
       |${prRoundsSql(PR_ROUNDS)}
       |SELECT doc_id, rq AS rank_micro,
       |  round(CAST(rq AS DOUBLE) / 1000000, 4) AS rank
       |FROM r$PR_ROUNDS ORDER BY doc_id""".stripMargin

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp12_chunk_dedup" -> lp12ChunkDedup,
    "m19_vector_stats" -> m19VectorStats,
    "lg_pagerank" -> lgPagerank)

  val oracleSql: Map[String, String] = Map(
    "lp12_chunk_dedup" ->
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3
        |),
        |ch AS (
        |  SELECT doc_id, i, array_to_string(list_slice(w, i, i + 2), ' ') AS chunk
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1, 3)) AS i FROM words)
        |),
        |r AS (
        |  SELECT doc_id, chunk,
        |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, i) AS rn
        |  FROM ch
        |)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "m19_vector_stats" ->
      """SELECT i AS dim,
        |  round(avg(CAST(embedding[CAST(i AS INTEGER) + 1] AS DOUBLE)), 4) AS mean,
        |  round(var_samp(CAST(embedding[CAST(i AS INTEGER) + 1] AS DOUBLE)), 4) AS variance
        |FROM embeddings, range(64) t(i)
        |GROUP BY i ORDER BY dim""".stripMargin,
    "lg_pagerank" -> pagerankSql)
}
