package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables}
import graft.operators.{Components, Similarity}

/** Round-10 surface batch 78: the curation step between "clusters
  * found" and "corpus deduped" — CANONICAL SELECTION: inside every
  * near-dup cluster pick the representative to KEEP (longest document
  * wins, ties to the smallest id — the keep-longest policy production
  * dedup pipelines default to) and count what gets dropped. The
  * fixture embeddings are near-orthogonal (max pairwise cosine
  * ≈ 0.48), so the cluster threshold here is fixture-calibrated to
  * 0.40 — the operator itself is threshold-agnostic. lc finds
  * the clusters and lc2 counts them; this emits the actionable keep
  * list. Clusters come from the same embedding near-dup pairs +
  * Components (hash-min + pointer doubling) closure; the argmax is an
  * exact lexicographic struct-max, so the keep decision is
  * bit-deterministic. Oracle: the shared recursive-CTE closure plus a
  * rank window.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.10 (dedup family), siblings lc/lc2/lp24.
  */
object SurfaceR10bz extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** LP66: CANONICAL SELECTION — for every multi-member near-dup
    * cluster: size, the kept document (max n_chars, tiebreak min id),
    * its length, and the drop count. */
  val lp66CanonicalSelection: Q = (s, d) => {
    val e = embeddings(s, d)
    val edges = Similarity
      .exactNearDupPairs(e, threshold = 0.40, nlist = 8)
      .select(col("a_id"), col("b_id"))
    val comp = Components
      .connectedComponents(e.select(col("vec_id")), edges)
      .select(col("id").as("vec_id"), col("lbl").as("cluster_id"))
    val meta = documents(s, d).select(col("doc_id").as("vec_id"), col("n_chars"))
    comp.join(meta, "vec_id")
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("sz"),
        max(struct(col("n_chars"), (-col("vec_id")).as("negid"))).as("best"))
      .where(col("sz") >= 2)
      .select(col("cluster_id"), col("sz"),
        (-col("best.negid")).as("canonical_id"),
        col("best.n_chars").as("canonical_chars"),
        (col("sz") - 1L).as("n_dropped"))
      .orderBy("cluster_id")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp66_canonical_selection" -> lp66CanonicalSelection)

  private val ccOracleCtes: String =
    """WITH RECURSIVE edges AS (
      |  SELECT a.vec_id AS s, b.vec_id AS t
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
      |                         CAST(a.embedding AS DOUBLE[])) > 0
      |    AND list_dot_product(CAST(b.embedding AS DOUBLE[]),
      |                         CAST(b.embedding AS DOUBLE[])) > 0
      |    AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                               CAST(b.embedding AS DOUBLE[])) >= 0.40
      |),
      |sym AS (SELECT s, t FROM edges UNION ALL SELECT t, s FROM edges),
      |reach(id, lbl) AS (
      |  SELECT vec_id, vec_id FROM embeddings
      |  UNION
      |  SELECT sym.t, reach.lbl FROM reach JOIN sym ON sym.s = reach.id
      |),
      |comp AS (SELECT id, min(lbl) AS lbl FROM reach GROUP BY id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "lp66_canonical_selection" ->
      s"""$ccOracleCtes,
         |joined AS (
         |  SELECT c.lbl AS cluster_id, c.id AS vec_id, d.n_chars,
         |    CAST(count(*) OVER (PARTITION BY c.lbl) AS BIGINT) AS sz,
         |    row_number() OVER (PARTITION BY c.lbl
         |      ORDER BY d.n_chars DESC, c.id) AS rk
         |  FROM comp c JOIN documents d ON d.doc_id = c.id)
         |SELECT cluster_id, sz,
         |  CAST(vec_id AS BIGINT) AS canonical_id,
         |  CAST(n_chars AS BIGINT) AS canonical_chars,
         |  CAST(sz - 1 AS BIGINT) AS n_dropped
         |FROM joined
         |WHERE rk = 1 AND sz >= 2
         |ORDER BY cluster_id""".stripMargin)
}
