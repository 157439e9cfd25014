package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 83: k-core peeling over the kNN similarity
  * graph, and a standardized ridge-regression path from exact integer
  * moments.
  *
  * Contrast with near-siblings: lg2/lg6 count triangles (local density
  * via closed wedges), lg5 propagates labels; k-core is the SUBGRAPH
  * operator — iteratively delete vertices of degree < k until a
  * fixpoint, yielding the maximal subgraph of minimum degree k (the
  * standard "dense region" extractor a near-dup analyst runs after
  * building the similarity graph, and not derivable from triangle or
  * component outputs). m5/m122/m148 fit UNREGULARIZED lines (OLS,
  * Theil–Sen, Deming); the ridge path shows how the two standardized
  * slopes shrink as the L2 penalty grows — the collinearity diagnostic
  * regularized training actually uses, with a closed 2×2 form no
  * iterative fit can drift from.
  *
  * Float discipline: the peel loop is pure integer degree counting; the
  * per-round readout is (round, n_vertices, degree_sum) — all BIGINT.
  * Ridge moments are exact BIGINT sums over integer-quantized columns
  * (quantity is integral, discount in cents, price in rounded dollars);
  * correlations and slopes are fixed shared double formulas over those
  * exact integers, so both engines compute bit-identical doubles.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.9 (similarity graph ops) and §2.13 (regression),
  * siblings lg2/lg5/m5/m122.
  */
object SurfaceR10ce extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val K = 4      // core order: keep vertices with degree >= 4
  private val ROUNDS = 6 // bounded peel rounds (fixpoint check in spec)

  /** LG8: K-CORE PEELING — start from the symmetrized 3-NN edge set
    * (every vertex has degree >= 3 by construction, so k=4 is the first
    * order at which peeling bites) and run 6 rounds of "drop vertices
    * with induced degree < 4". Per round, report the surviving vertex
    * count and induced degree sum (= 2x induced edge count) — the peel
    * trajectory, 7 rows, never empty even when the core empties.
    *
    * Scale shape: each round is two equi-joins on integer vertex ids +
    * one hash agg — shuffle keyed by vertex, map-side combinable, and
    * the round count is fixed so the plan is a bounded chain. The
    * eager localCheckpoint per round truncates lineage exactly like
    * lg3's frontier BFS (SurfaceR6h.scala). At 100 TB the same loop
    * runs over LSH/IVF candidate edges unchanged.
    */
  val lg8Kcore: Q = (s, d) => {
    val e0 = SurfaceR6h.knnEdges(s, d).localCheckpoint(true)
    val und = e0.union(e0.select(col("t").as("s"), col("s").as("t")))
      .localCheckpoint(true)

    def induced(verts: DataFrame): DataFrame =
      und.join(verts.select(col("v").as("va")), col("s") === col("va"))
        .join(verts.select(col("v").as("vb")), col("t") === col("vb"))
        .groupBy("s").agg(count(lit(1)).as("dg"))

    def readout(round: Int, verts: DataFrame): DataFrame =
      induced(verts).agg(
        coalesce(count(lit(1)), lit(0L)).as("n_vertices"),
        coalesce(sum("dg"), lit(0L)).as("degree_sum"))
        .select(lit(round.toLong).as("round"), col("n_vertices"),
          col("degree_sum"))

    var verts = und.select(col("s").as("v")).distinct().localCheckpoint(true)
    var out = readout(0, verts)
    for (i <- 1 to ROUNDS) {
      verts = induced(verts).where(col("dg") >= K)
        .select(col("s").as("v")).localCheckpoint(true)
      out = out.union(readout(i, verts))
    }
    out.orderBy("round")
  }

  /** M168: STANDARDIZED RIDGE PATH — regress each order's dollar total
    * on its (line-item count, total quantity) — two predictors the
    * fixture makes strongly collinear (r ≈ 0.87, both driven by order
    * size) — in correlation form, solving the 2×2 ridge system
    * (R + λI)b = r for λ ∈ {0, 0.1, 1}. Under collinearity OLS splits
    * the shared signal across both slopes with inflated magnitudes;
    * the path shows the penalty pulling them toward the stable shared
    * direction. Moments are one pass of exact BIGINT sums (cents are
    * summed per order as integers before the rounded-dollar axis, and
    * quantity is integral); each λ row is the same closed formula over
    * the one broadcast moment row — no iterative fit, no float
    * accumulation order anywhere. */
  val m168RidgePath: Q = (s, d) => {
    val m = lineitem(s, d)
      .select(col("l_orderkey"),
        col("l_quantity").cast("long").as("lq"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("x1"), sum("lq").as("x2"),
        expr("CAST(sum(cents) AS BIGINT) div 100").as("y"))
      .agg(
        count(lit(1)).as("n"),
        sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
        sum(expr("x1 * x1")).as("s11"), sum(expr("x2 * x2")).as("s22"),
        sum(expr("x1 * x2")).as("s12"),
        sum(expr("x1 * y")).as("s1y"), sum(expr("x2 * y")).as("s2y"),
        sum(expr("y * y")).as("syy"))
    val lam = s.range(1).select(explode(array(
      lit(0.0), lit(0.1), lit(1.0))).as("lambda"))
    lam.crossJoin(broadcast(m))
      .withColumn("c11", expr("s11 - CAST(s1 AS DOUBLE) * s1 / n"))
      .withColumn("c22", expr("s22 - CAST(s2 AS DOUBLE) * s2 / n"))
      .withColumn("c12", expr("s12 - CAST(s1 AS DOUBLE) * s2 / n"))
      .withColumn("c1y", expr("s1y - CAST(s1 AS DOUBLE) * sy / n"))
      .withColumn("c2y", expr("s2y - CAST(s2 AS DOUBLE) * sy / n"))
      .withColumn("cyy", expr("syy - CAST(sy AS DOUBLE) * sy / n"))
      .withColumn("r12", expr("c12 / sqrt(c11 * c22)"))
      .withColumn("r1y", expr("c1y / sqrt(c11 * cyy)"))
      .withColumn("r2y", expr("c2y / sqrt(c22 * cyy)"))
      .withColumn("det", expr("(1 + lambda) * (1 + lambda) - r12 * r12"))
      .select(col("lambda"),
        r4(expr("((1 + lambda) * r1y - r12 * r2y) / det")).as("b_items_std"),
        r4(expr("((1 + lambda) * r2y - r12 * r1y) / det")).as("b_qty_std"),
        r4(col("r12")).as("r_items_qty"))
      .orderBy("lambda")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lg8_kcore" -> lg8Kcore,
    "m168_ridge_path" -> m168RidgePath)

  /** Unrolled peel rounds: CTE chain v0..v6, one readout row per round.
    * Generated by the same (K, ROUNDS) constants as the Spark side so
    * the two cannot drift. Every multiply-referenced CTE is pinned
    * `AS MATERIALIZED`: DuckDB inlines plain CTEs, and with d/v each
    * referencing its predecessor twice the unrolled chain re-expands
    * the O(n²) kNN subquery 2^ROUNDS times — enough to OOM the oracle
    * engine mid-drive (seen in the r10 full drive; the isolated run
    * only passed by luck of allocator headroom). */
  private def kcoreSql: String = {
    val edges = SurfaceR6h.knnEdgesCte
      .replace("e AS (", "e AS MATERIALIZED (")
    val header =
      s"""WITH $edges,
         |und AS MATERIALIZED (
         |  SELECT s, t FROM e UNION ALL SELECT t AS s, s AS t FROM e),
         |v0 AS MATERIALIZED (SELECT DISTINCT s AS v FROM und)""".stripMargin
    val rounds = (1 to ROUNDS).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT u.s AS v, count(*) AS dg FROM und u
         |  JOIN v${i - 1} a ON u.s = a.v JOIN v${i - 1} b ON u.t = b.v
         |  GROUP BY u.s),
         |v$i AS MATERIALIZED (SELECT v FROM d$i WHERE dg >= $K)""".stripMargin
    }.mkString(",\n")
    val readouts = (0 to ROUNDS).map { i =>
      s"""SELECT CAST($i AS BIGINT) AS round,
         |  CAST(count(*) AS BIGINT) AS n_vertices,
         |  CAST(coalesce(sum(dg), 0) AS BIGINT) AS degree_sum
         |FROM (SELECT u.s, count(*) AS dg FROM und u
         |  JOIN v$i a ON u.s = a.v JOIN v$i b ON u.t = b.v
         |  GROUP BY u.s)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$header,\n$rounds\n$readouts\nORDER BY round"
  }

  val oracleSql: Map[String, String] = Map(
    "lg8_kcore" -> kcoreSql,
    "m168_ridge_path" ->
      """WITH per_order AS (
        |  SELECT CAST(count(*) AS BIGINT) AS x1,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) // 100 AS y
        |  FROM lineitem GROUP BY l_orderkey),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
        |    sum(x1 * x1) AS s11, sum(x2 * x2) AS s22, sum(x1 * x2) AS s12,
        |    sum(x1 * y) AS s1y, sum(x2 * y) AS s2y, sum(y * y) AS syy
        |  FROM per_order),
        |lam AS (SELECT unnest([0e0, 0.1e0, 1e0]) AS lambda),
        |base AS (
        |  SELECT lambda,
        |    s12 - CAST(s1 AS DOUBLE) * s2 / n AS c12,
        |    s11 - CAST(s1 AS DOUBLE) * s1 / n AS c11,
        |    s22 - CAST(s2 AS DOUBLE) * s2 / n AS c22,
        |    s1y - CAST(s1 AS DOUBLE) * sy / n AS c1y,
        |    s2y - CAST(s2 AS DOUBLE) * sy / n AS c2y,
        |    syy - CAST(sy AS DOUBLE) * sy / n AS cyy
        |  FROM lam CROSS JOIN m),
        |corr AS (
        |  SELECT lambda,
        |    c12 / sqrt(c11 * c22) AS r12,
        |    c1y / sqrt(c11 * cyy) AS r1y,
        |    c2y / sqrt(c22 * cyy) AS r2y
        |  FROM base)
        |SELECT lambda,
        |  round(((1 + lambda) * r1y - r12 * r2y)
        |    / ((1 + lambda) * (1 + lambda) - r12 * r12), 4) AS b_items_std,
        |  round(((1 + lambda) * r2y - r12 * r1y)
        |    / ((1 + lambda) * (1 + lambda) - r12 * r12), 4) AS b_qty_std,
        |  round(r12, 4) AS r_items_qty
        |FROM corr ORDER BY lambda""".stripMargin)
}
