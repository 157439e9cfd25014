package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 62: vocabulary richness + density clustering
  * — YULE'S CHARACTERISTIC K (the scale-free repeat-rate measure of
  * vocabulary concentration, the constant lexicographers report next
  * to the Heaps/Zipf fits lt26/lt19 already produce) with Simpson's
  * diversity and the hapax/dis-legomena spectrum, and DBSCAN role
  * classification (core/border/noise + cluster ids) on the bounded
  * embedding probe set — the density-based answer to "how many blobs,
  * and which points are outliers?" that k-means (m6) cannot give.
  * Yule/Simpson are exact integer corpus sums; DBSCAN distances are
  * exact quantized-integer squared distances (m30 idiom) and the
  * cluster ids come from the production Components operator
  * (hash-min + pointer doubling) on the core-core graph, oracled by a
  * recursive-CTE reachability replay.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.9 (text stats), §2.12 (embedding ops).
  */
object SurfaceR10bj extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LT42: Yule's K ----

  private val ykK =
    "(10000.0 * (CAST(s2 AS DOUBLE) - n_tok) / (CAST(n_tok AS DOUBLE) * n_tok))"
  /** LT42: YULE'S K — K = 10⁴·(Σc² − N)/N² over corpus token counts,
    * with Simpson's diversity D = Σc(c−1)/(N(N−1)) and the V₁/V₂
    * spectrum head. One (token → count) hash agg, then a 5-integer
    * reduction — the whole report is exact BIGINTs until the two
    * final ratios. Embarrassingly scale-stable at 100 TB. */
  val lt42YuleK: Q = (s, d) => {
    val counts = documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    counts.agg(
      sum("c").as("n_tok"),
      count(lit(1)).as("vocab"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("v1"),
      sum(when(col("c") === 2, 1L).otherwise(0L)).as("v2"),
      sum(col("c") * col("c")).as("s2"))
      .select(col("n_tok"), col("vocab"), col("v1"), col("v2"),
        r4(expr(ykK)).as("yule_k"),
        r4(expr("(CAST(s2 AS DOUBLE) - n_tok) / (CAST(n_tok AS DOUBLE) * (n_tok - 1))"))
          .as("simpson_d"))
  }

  // ---- M147: DBSCAN ----

  private val dbEps2 = 170000000L // eps^2 in quantized-integer units
  private val dbMinPts = 3 // neighbourhood size INCLUDING the point

  /** M147: DBSCAN — over the 25-vector probe set (vec_id % 20 = 0):
    * exact integer squared distances, eps²=1.7e8, minPts=3. Core =
    * ≥ minPts−1 neighbours; clusters = connected components of the
    * core-core graph (Components operator — the same hash-min +
    * pointer-doubling plan the dedup stack runs at corpus scale);
    * border points adopt the smallest adjacent core's cluster; noise
    * gets −1. Every distance and degree is exact, so roles and ids
    * are bit-deterministic. The probe is bounded by construction —
    * at 100 TB the same query shape runs on LSH/IVF candidate pairs
    * (l5/li) instead of the quadratic probe join. */
  val m147Dbscan: Q = (s, d) => {
    val dims = embeddings(s, d)
      .where(col("vec_id") % 20 === 0)
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("vec_id"), col("i"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1e4 + 5e-1) AS BIGINT)").as("q"))
    val pairs = dims.as("a")
      .join(dims.as("b"),
        col("a.i") === col("b.i") && col("a.vec_id") < col("b.vec_id"))
      .groupBy(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"))
      .agg(sum((col("a.q") - col("b.q")) * (col("a.q") - col("b.q")))
        .as("d2"))
      .where(col("d2") <= dbEps2)
    val edges = pairs.select(col("ida").as("src"), col("idb").as("dst"))
      .localCheckpoint(true)
    val sym = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = dims.select(col("vec_id")).distinct()
    val deg = nodes.join(sym, nodes("vec_id") === sym("src"), "left")
      .groupBy(col("vec_id"))
      .agg(sum(when(col("dst").isNotNull, 1L).otherwise(0L)).as("n_nbr"))
    val cores = deg.where(col("n_nbr") >= dbMinPts - 1).select("vec_id")
    val coreEdges = sym
      .join(cores.select(col("vec_id").as("src")), "src")
      .join(cores.select(col("vec_id").as("dst")), "dst")
      .select("src", "dst")
    val comp = graft.operators.Components
      .connectedComponents(cores, coreEdges)
      .toDF("vec_id", "comp")
    // border: non-core adjacent to >=1 core -> min adjacent core comp.
    val borderComp = sym
      .join(comp.select(col("vec_id").as("dst"), col("comp")), "dst")
      .groupBy(col("src").as("vec_id"))
      .agg(min("comp").as("bcomp"))
    deg
      .join(comp, Seq("vec_id"), "left")
      .join(borderComp, Seq("vec_id"), "left")
      .select(col("vec_id"), col("n_nbr"),
        when(col("comp").isNotNull, "core")
          .when(col("bcomp").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("comp"), col("bcomp"), lit(-1L)).as("cluster"))
      .orderBy("vec_id")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt42_yule_k" -> lt42YuleK,
    "m147_dbscan" -> m147Dbscan)

  val oracleSql: Map[String, String] = Map(
    "lt42_yule_k" ->
      """WITH counts AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
        |  GROUP BY tok),
        |agg AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS n_tok,
        |    CAST(count(*) AS BIGINT) AS vocab,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
        |    CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM counts)
        |SELECT n_tok, vocab, v1, v2,
        |  round(10000.0 * (CAST(s2 AS DOUBLE) - n_tok) / (CAST(n_tok AS DOUBLE) * n_tok), 4) AS yule_k,
        |  round((CAST(s2 AS DOUBLE) - n_tok) / (CAST(n_tok AS DOUBLE) * (n_tok - 1)), 4) AS simpson_d
        |FROM agg""".stripMargin,
    "m147_dbscan" ->
      s"""WITH dims AS (
        |  SELECT vec_id, CAST(i AS BIGINT) AS i,
        |    CAST(floor(CAST(list_extract(embedding, CAST(i + 1 AS INT)) AS DOUBLE)
        |               * 1e4 + 5e-1) AS BIGINT) AS q
        |  FROM embeddings CROSS JOIN range(64) AS t(i)
        |  WHERE vec_id % 20 = 0),
        |pairs AS (
        |  SELECT a.vec_id AS ida, b.vec_id AS idb,
        |    CAST(sum((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS d2
        |  FROM dims a JOIN dims b ON a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |sym AS (
        |  SELECT ida AS src, idb AS dst FROM pairs WHERE d2 <= $dbEps2
        |  UNION ALL
        |  SELECT idb, ida FROM pairs WHERE d2 <= $dbEps2),
        |nodes AS (SELECT DISTINCT vec_id FROM dims),
        |deg AS (
        |  SELECT n.vec_id,
        |    CAST(count(s.dst) AS BIGINT) AS n_nbr
        |  FROM nodes n LEFT JOIN sym s ON s.src = n.vec_id
        |  GROUP BY 1),
        |cores AS (SELECT vec_id FROM deg WHERE n_nbr >= ${dbMinPts - 1}),
        |core_edges AS (
        |  SELECT s.src, s.dst FROM sym s
        |  JOIN cores c1 ON c1.vec_id = s.src
        |  JOIN cores c2 ON c2.vec_id = s.dst),
        |reach AS (
        |  WITH RECURSIVE r(root, node) AS (
        |    SELECT vec_id, vec_id FROM cores
        |    UNION
        |    SELECT r.root, e.dst FROM r JOIN core_edges e ON e.src = r.node)
        |  SELECT node AS vec_id, CAST(min(root) AS BIGINT) AS comp
        |  FROM r GROUP BY node),
        |border AS (
        |  SELECT s.src AS vec_id, CAST(min(c.comp) AS BIGINT) AS bcomp
        |  FROM sym s JOIN reach c ON c.vec_id = s.dst
        |  GROUP BY 1)
        |SELECT d.vec_id, d.n_nbr,
        |  CASE WHEN r.comp IS NOT NULL THEN 'core'
        |       WHEN b.bcomp IS NOT NULL THEN 'border'
        |       ELSE 'noise' END AS role,
        |  CAST(coalesce(r.comp, b.bcomp, -1) AS BIGINT) AS cluster
        |FROM deg d
        |LEFT JOIN reach r ON r.vec_id = d.vec_id
        |LEFT JOIN border b ON b.vec_id = d.vec_id
        |ORDER BY d.vec_id""".stripMargin)
}
