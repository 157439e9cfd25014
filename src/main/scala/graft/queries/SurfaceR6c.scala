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
object SurfaceR6c {
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

  /** LG: join-based PageRank (d=0.85, 10 iterations) over the MinHash
    * banding candidate graph, symmetrized — the centrality signal for
    * choosing a cluster's canonical document. Each iteration is one
    * equi-join + one aggregation on doc_id (two shuffles), so 10
    * iterations = a fixed pipeline of 20 shuffles regardless of corpus
    * size. Each iteration is pinned with an EAGER `localCheckpoint`
    * (the operators/Components.scala idiom; on a cluster: `checkpoint`
    * to DFS) so plan depth stays constant instead of growing 10 joins
    * deep; at 100 TB additionally pre-partition ranks and edges on
    * doc_id so the join side of every iteration is co-located.
    * Engine-specific float summation order makes the low decimals
    * run-dependent, so this is a law-spec entry (SurfaceR6Spec:
    * rank mass conservation, positivity, isolated-node fixpoint), not
    * an oracle row.
    */
  val lgPagerank: Q = (s, d) => {
    val nodes = documents(s, d).select(col("doc_id")).localCheckpoint(true)
    val cand = graft.operators.TextOps.minHashCandidates(
      documents(s, d), "doc_id", "text")
    val edges = cand.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(cand.select(col("b_id").as("src"), col("a_id").as("dst")))
      .localCheckpoint(true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val damp = 0.85
    var ranks = nodes.select(col("doc_id"), lit(1.0).as("rank"))
    for (_ <- 1 to 10) {
      val contrib = edges.join(ranks, edges("src") === ranks("doc_id"))
        .join(deg, "src")
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy("dst").agg(sum("c").as("inflow"))
      // eager localCheckpoint: constant plan depth across iterations
      ranks = nodes.join(contrib, nodes("doc_id") === contrib("dst"), "left")
        .select(nodes("doc_id"),
          (lit(1 - damp) + lit(damp) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    ranks.select(col("doc_id"), r4(col("rank")).as("rank")).orderBy("doc_id")
  }

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
        |GROUP BY i ORDER BY dim""".stripMargin)
}
