package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.functions.VectorFunctions

/** Round-6 wave 5: graph analytics over the embedding kNN graph
  * (triangle counting, multi-source BFS) — both ORACLE-checked, unlike
  * the law-spec PageRank — plus exponentially-weighted moving averages
  * and a unigram language-model quality score for the curation ladder.
  *
  * The kNN graph is the canonical similarity graph a dedup/curation
  * pipeline builds anyway; at fixture scale the neighbor lists come from
  * the exact O(n²) scan with the codegen cosine kernel, and at 100 TB
  * the SAME downstream graph ops run unchanged over IVF/LSH-generated
  * candidate lists (operators/Similarity.scala) — the graph algebra
  * below never assumes how edges were produced.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.9 (LLM ops), §2.6 (windows), §2.10 (time).
  */
object SurfaceR6h extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Undirected 3-NN edge set over the even-id half of the embedding
    * corpus: a → its 3 nearest by exact cosine (ties broken by id), then
    * symmetrized with least/greatest. One row per undirected edge.
    *
    * Scale shape: the O(n²) candidate scan is the fixture-sized stand-in
    * — swap in `Similarity.ivfTopK` candidates and everything below is
    * an equi-join pipeline on integer ids (shuffle keyed by vertex,
    * map-side combinable aggs, no broadcast of anything O(n)).
    */
  private[graft] def knnEdges(s: SparkSession, d: String): DataFrame =
    knnDirected(s, d)
      .select(least(col("src"), col("dst")).as("s"),
        greatest(col("src"), col("dst")).as("t"))
      .distinct()

  /** The directed 3-NN relation BEFORE symmetrization (src → its top-3
    * by cosine, ties by id) — the kNN graph is inherently asymmetric
    * (out-degree exactly 3, in-degree skewed toward hubs), which is
    * what lg9's HITS exploits. Mirrors the `knn` CTE in
    * [[knnEdgesCte]]. */
  private[graft] def knnDirected(s: SparkSession, d: String): DataFrame = {
    val nodes = embeddings(s, d).where(col("vec_id") % 2 === 0)
    val a = nodes.select(col("vec_id").as("s_id"), col("embedding").as("a_emb"))
    val b = nodes.select(col("vec_id").as("t_id"), col("embedding").as("b_emb"))
    val w = Window.partitionBy("s_id")
      .orderBy(col("cos").desc, col("t_id").asc)
    a.join(broadcast(b), col("s_id") =!= col("t_id"))
      .withColumn("cos", VectorFunctions.cosineSim(col("a_emb"), col("b_emb")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("s_id").as("src"), col("t_id").as("dst"))
  }

  /** Oracle-side edge CTE, kept as one text so lg2/lg3 cannot drift. */
  private[queries] val knnEdgesCte: String =
    """nodes AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings WHERE vec_id % 2 = 0),
      |knn AS (
      |  SELECT s, t FROM (
      |    SELECT a.vec_id AS s, b.vec_id AS t,
      |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
      |        list_cosine_similarity(a.v, b.v) DESC, b.vec_id) AS rn
      |    FROM nodes a JOIN nodes b ON a.vec_id <> b.vec_id)
      |  WHERE rn <= 3),
      |e AS (SELECT DISTINCT least(s, t) AS s, greatest(s, t) AS t FROM knn)""".stripMargin

  // ---- LG2: triangle counting ----

  /** LG2: per-vertex triangle counts on the kNN graph — the local
    * clustering signal (a doc whose neighbors are also mutual neighbors
    * sits in a dense near-dup pocket). The enumeration is the standard
    * oriented three-way self-join: every edge stored s<t, so each
    * triangle (a<b<c) is produced exactly once as (a,b)+(b,c)+(a,c) —
    * no /6 correction pass. Two shuffle joins on integer keys; at scale
    * the orientation would be by (degree, id) to bound the join fan-out
    * on hub vertices, which changes nothing downstream.
    */
  val lg2Triangles: Q = (s, d) => {
    // eager localCheckpoint, not cache: blocks are reclaimed once the
    // DataFrame is unreachable (a registry drive runs 229 queries in one
    // session — CacheManager entries would accumulate for its lifetime)
    val e = knnEdges(s, d).localCheckpoint(true)
    val e1 = e.select(col("s").as("a"), col("t").as("b"))
    val e2 = e.select(col("s").as("b2"), col("t").as("c2"))
    val e3 = e.select(col("s").as("a3"), col("t").as("c3"))
    val tri = e1
      .join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c2") === col("c3"))
      .select(col("a"), col("b"), col("c2").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("vec_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("n_triangles"))
      .orderBy("vec_id")
  }

  // ---- LG3: multi-source BFS ----

  /** LG3: hop distance from the anchor set (vec_id % 50 = 0) through the
    * kNN graph, depth ≤ 4 — "how far is each doc from a curated seed".
    * The Spark side is proper frontier BFS: each round expands only the
    * newly discovered vertices (anti-join against the visited set), so
    * per-round cost is |frontier|·avg-degree — never the path-explosion
    * closure the naive recursive form implies. Fixed depth = fixed plan;
    * each round is one equi-join + one anti-join on vertex id.
    */
  val lg3Bfs: Q = (s, d) => {
    val und = knnEdges(s, d)
    val adj = und.union(und.select(col("t").as("s"), col("s").as("t")))
      .localCheckpoint(true)
    val anchors = embeddings(s, d)
      .where(col("vec_id") % 2 === 0 && col("vec_id") % 50 === 0)
      .select(col("vec_id").as("v"))
    var visited = anchors.withColumn("dist", lit(0))
    var frontier = anchors
    for (i <- 1 to 4) {
      val next = frontier.join(adj, col("v") === col("s"))
        .select(col("t").as("v")).distinct()
        .join(visited.select("v"), Seq("v"), "left_anti")
        .localCheckpoint(true)
      visited = visited.union(next.withColumn("dist", lit(i)))
      frontier = next
    }
    visited.select(col("v").as("vec_id"), col("dist")).orderBy("vec_id")
  }

  // ---- T15: EWMA ----

  /** T15: per-user exponentially weighted moving average (α = 0.1,
    * adjust-form) over the daily value series. Expressed as the ratio of
    * two RUNNING sums — Σ vⱼ·w⁻ʲ / Σ w⁻ʲ over the cumulative frame — so
    * the "recursive" smoother becomes two stock window aggregates: one
    * shuffle by user, sequential scan per partition, no iteration. The
    * w⁻ʲ weights stay bounded (w⁻³⁰ ≈ 24) on the month-long fixture; an
    * unbounded series would renumber j per chunk to keep the exponent
    * windowed.
    */
  val t15Ewma: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(avg("value").as("v"))
    val byDay = Window.partitionBy("user_id").orderBy("day")
    val cum = byDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("j", row_number().over(byDay).cast("double"))
      .withColumn("wj", pow(lit(1.0 / 0.9), col("j")))
      .select(col("user_id"), col("day"),
        r4(sum(col("v") * col("wj")).over(cum) / sum(col("wj")).over(cum))
          .as("ewma"))
      .orderBy("user_id", "day")
  }

  // ---- L15: unigram LM quality score ----

  /** L15: unigram language-model log-probability per document — the
    * classic cheap perplexity proxy for corpus quality gating (docs of
    * rare/garbage tokens score low). Three hash aggs and one join: token
    * counts (vocab), corpus total (one scalar, broadcast), then
    * avg(ln p(tok)) per doc. The vocab side is sublinear in corpus size,
    * so the scoring join broadcasts at any corpus scale.
    */
  val l15UnigramLogprob: Q = (s, d) => {
    val toks = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
    val total = vocab.agg(sum("n").as("total"))
    toks.join(broadcast(vocab), "tok")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        r4(avg(log(col("n").cast("double") / col("total"))))
          .as("avg_logprob"))
      .orderBy("doc_id")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lg2_triangles" -> lg2Triangles,
    "lg3_bfs" -> lg3Bfs,
    "t15_ewma" -> t15Ewma,
    "l15_unigram_logprob" -> l15UnigramLogprob)

  val oracleSql: Map[String, String] = Map(
    "lg2_triangles" ->
      s"""WITH $knnEdgesCte,
         |tri AS (
         |  SELECT e1.s AS a, e1.t AS b, e2.t AS c
         |  FROM e e1 JOIN e e2 ON e2.s = e1.t
         |       JOIN e e3 ON e3.s = e1.s AND e3.t = e2.t)
         |SELECT vec_id, count(*) AS n_triangles FROM (
         |  SELECT a AS vec_id FROM tri
         |  UNION ALL SELECT b FROM tri
         |  UNION ALL SELECT c FROM tri)
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "lg3_bfs" ->
      s"""WITH RECURSIVE $knnEdgesCte,
         |adj AS (SELECT s, t FROM e UNION ALL SELECT t, s FROM e),
         |anchors AS (
         |  SELECT vec_id AS v FROM embeddings
         |  WHERE vec_id % 2 = 0 AND vec_id % 50 = 0),
         |walk(v, dist) AS (
         |  SELECT v, 0 FROM anchors
         |  UNION ALL
         |  SELECT adj.t, walk.dist + 1 FROM walk JOIN adj ON adj.s = walk.v
         |  WHERE walk.dist < 4)
         |SELECT v AS vec_id, CAST(min(dist) AS INT) AS dist
         |FROM walk GROUP BY v ORDER BY vec_id""".stripMargin,
    "t15_ewma" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |         avg(value) AS v
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT user_id, day, v,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS DOUBLE) AS j
        |  FROM daily)
        |SELECT user_id, day,
        |  round(sum(v * power(1.0 / 0.9, j)) OVER w
        |        / sum(power(1.0 / 0.9, j)) OVER w, 4) AS ewma
        |FROM idx
        |WINDOW w AS (PARTITION BY user_id ORDER BY day
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, day""".stripMargin,
    "l15_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |vocab AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
        |tot AS (SELECT sum(n) AS total FROM vocab)
        |SELECT doc_id, count(*) AS n_toks,
        |  round(avg(ln(CAST(n AS DOUBLE) / total)), 4) AS avg_logprob
        |FROM toks JOIN vocab USING (tok) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
