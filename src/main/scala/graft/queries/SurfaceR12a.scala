package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-12 surface batch 1: the two operators VERDICT r11 ranked as
  * the top user-facing gaps — MERGE-INTO upsert as ONE library op
  * (item 3) and a bounded-length directed motif query over the kNN
  * graph (item 4).
  *
  * Contrast with near-siblings: q33 SCD2 builds a HISTORY (every
  * version kept, validity ranges); lp26 CDC-apply folds an ordered
  * change LOG (last-writer-wins by sequence); q49 is the third shape —
  * set-based MERGE of a keyed snapshot (matched→update, matched+flag→
  * delete, unmatched→insert), the ANSI MERGE contract. lg2 counts
  * UNDIRECTED triangles and lg4 scores pairs by common neighbors; lg14
  * is neither — it classifies DIRECTED 2-paths by their closing edge
  * (feed-forward vs cycle vs open), the triad-census signal that only
  * exists on the asymmetric kNN digraph.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.11 (pipeline ops), §2.13 (graph family).
  */
object SurfaceR12a extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- Q49: MERGE-INTO upsert ----

  /** Q49: MERGE-INTO over orders — target is the keyed snapshot
    * (quantized price, the §5.3 idiom); the source change set is
    * derived deterministically from the target itself so the oracle
    * can rebuild it: keys ≡ 0 (mod 5) arrive as updates (+100.00, and
    * ≡ 0 mod 25 of those flagged for DELETE), keys ≡ 3 (mod 7) arrive
    * shifted by 1e9 as brand-new inserts. The output is the full
    * post-merge table, so every MERGE branch (kept / updated /
    * deleted / inserted) is hash-checked row by row, not sampled.
    *
    * Scale shape: [[graft.operators.MergeUpsert]] — ONE full-outer
    * equi-join on the key (each side shuffles once, AQE skew-splits),
    * projections on top; no second pass over either input. */
  val q49MergeUpsert: Q = (s, d) => {
    val t = orders(s, d).select(col("o_orderkey"), col("o_custkey"),
      expr("CAST(floor(o_totalprice * 1e4 + 5e-1) AS BIGINT)").as("qprice"),
      col("o_orderstatus"))
    val updates = t.where(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("qprice") + 1000000L).as("qprice"), col("o_orderstatus"),
        (col("o_orderkey") % 25 === 0).as("del"))
    val inserts = t.where(col("o_orderkey") % 7 === 3)
      .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
        col("o_custkey"), col("qprice"),
        lit("N").as("o_orderstatus"), lit(false).as("del"))
    graft.operators.MergeUpsert
      .mergeUpsert(t, updates.union(inserts), Seq("o_orderkey"), Some("del"))
      .orderBy("o_orderkey")
  }

  // ---- LG14: directed 2-path motif census ----

  /** LG14: TRIAD MOTIF CENSUS on the directed 3-NN graph — for every
    * middle vertex B, classify each directed 2-path A→B→C (A≠C) by its
    * closing edge: A→C makes it a FEED-FORWARD triad (B is a shortcut
    * that the closure confirms), C→A a CYCLE, both edges 'both', and
    * no closure an OPEN wedge (B bridges otherwise-unlinked regions —
    * the hub/broker signal). This is GraphFrames-style motif finding
    * `(a)-[]->(b); (b)-[]->(c)` with negation, expressed as
    * join-per-hop; all scores are exact integer counts.
    *
    * Scale shape: the census itself is two equi-joins on vertex id
    * plus two marker left-joins against the edge list, per-path cost
    * bounded by out-degree k=3 (fanout ≤ k² per vertex) — the
    * at-scale shape whatever produced the edges. The kNN edge
    * construction is the lg2-family fixture stand-in (checkpointed,
    * swap in Similarity.ivfTopK at scale — SurfaceR6h note). */
  val lg14MotifCensus: Q = (s, d) => {
    val dir = SurfaceR6h.knnDirected(s, d).localCheckpoint(true)
    val paths = dir.select(col("src").as("a"), col("dst").as("b"))
      .join(dir.select(col("src").as("b2"), col("dst").as("c")),
        col("b") === col("b2") && col("a") =!= col("c"))
      .select("a", "b", "c")
    val fwd = dir.select(col("src").as("fa"), col("dst").as("fc"),
      lit(true).as("__f"))
    val back = dir.select(col("src").as("ga"), col("dst").as("gc"),
      lit(true).as("__g"))
    val cls = paths
      .join(fwd, col("a") === col("fa") && col("c") === col("fc"), "left")
      .join(back, col("c") === col("ga") && col("a") === col("gc"), "left")
      .select(col("b"),
        when(col("__f").isNotNull && col("__g").isNotNull, "both")
          .when(col("__f").isNotNull, "ffl")
          .when(col("__g").isNotNull, "cycle")
          .otherwise("open").as("cls"))
    cls.groupBy(col("b").as("vec_id"))
      .agg(
        sum(when(col("cls") === "open", 1L).otherwise(0L)).as("n_open"),
        sum(when(col("cls") === "ffl", 1L).otherwise(0L)).as("n_ffl"),
        sum(when(col("cls") === "cycle", 1L).otherwise(0L)).as("n_cycle"),
        sum(when(col("cls") === "both", 1L).otherwise(0L)).as("n_both"),
        count(lit(1)).as("n_paths"))
      .orderBy("vec_id")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "q49_merge_upsert" -> q49MergeUpsert,
    "lg14_motif_census" -> lg14MotifCensus)

  val oracleSql: Map[String, String] = Map(
    "q49_merge_upsert" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(floor(o_totalprice * 1e4 + 5e-1) AS BIGINT) AS qprice,
        |    o_orderstatus
        |  FROM orders),
        |s AS (
        |  SELECT o_orderkey, o_custkey, qprice + 1000000 AS qprice,
        |    o_orderstatus, (o_orderkey % 25 = 0) AS del
        |  FROM t WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, o_custkey, qprice,
        |    'N' AS o_orderstatus, FALSE AS del
        |  FROM t WHERE o_orderkey % 7 = 3),
        |m AS (
        |  SELECT
        |    COALESCE(s.o_orderkey, t.o_orderkey) AS o_orderkey,
        |    CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
        |         ELSE t.o_custkey END AS o_custkey,
        |    CASE WHEN s.o_orderkey IS NOT NULL THEN s.qprice
        |         ELSE t.qprice END AS qprice,
        |    CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
        |         ELSE t.o_orderstatus END AS o_orderstatus,
        |    (t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
        |      AND s.del) AS deleted
        |  FROM t FULL JOIN s ON t.o_orderkey = s.o_orderkey)
        |SELECT o_orderkey, o_custkey, qprice, o_orderstatus
        |FROM m WHERE NOT deleted ORDER BY o_orderkey""".stripMargin,
    "lg14_motif_census" ->
      s"""WITH ${SurfaceR6h.knnEdgesCte},
        |p AS (
        |  SELECT ab.s AS a, ab.t AS b, bc.t AS c
        |  FROM knn ab JOIN knn bc ON ab.t = bc.s AND ab.s <> bc.t),
        |cls AS (
        |  SELECT p.b,
        |    CASE WHEN f.s IS NOT NULL AND g.s IS NOT NULL THEN 'both'
        |         WHEN f.s IS NOT NULL THEN 'ffl'
        |         WHEN g.s IS NOT NULL THEN 'cycle'
        |         ELSE 'open' END AS cls
        |  FROM p
        |  LEFT JOIN knn f ON f.s = p.a AND f.t = p.c
        |  LEFT JOIN knn g ON g.s = p.c AND g.t = p.a)
        |SELECT b AS vec_id,
        |  CAST(sum(CASE WHEN cls = 'open' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(sum(CASE WHEN cls = 'ffl' THEN 1 ELSE 0 END) AS BIGINT) AS n_ffl,
        |  CAST(sum(CASE WHEN cls = 'cycle' THEN 1 ELSE 0 END) AS BIGINT) AS n_cycle,
        |  CAST(sum(CASE WHEN cls = 'both' THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
        |  CAST(count(*) AS BIGINT) AS n_paths
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin)
}
