package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.PrefixSum

/** Round-10 surface batch 87: Newman modularity of the label-prop
  * communities, and global rank-normalization (the QuantileTransformer
  * shape) via value-compression + PrefixSum.
  *
  * Contrast with near-siblings: lg5 FINDS communities (and lg6/lg2
  * measure local density); lg10 SCORES a partition — modularity is the
  * objective Q = Σ_c[e_c/m − (deg_c/2m)²] that community detection
  * optimizes, so it turns "we clustered the near-dup graph" into a
  * number a pipeline can gate on (Q≈0 ⇒ the partition is no better
  * than random wiring). w8's percent_rank is the WINDOW function —
  * fine per-partition, banned globally (single-task funnel on
  * data-scaling input); m46 builds ECDFs internally for a TEST
  * readout; m170 is the feature TRANSFORM — every row mapped to its
  * global percent-rank — built the way that survives 100 TB: compress
  * to distinct values, one range-partitioned prefix sum over the value
  * table, then an equi-join back to the facts.
  *
  * Float discipline: modularity is exact — with integer m, e_c, deg_c,
  * Q = Σ_c(4m·e_c − deg_c²)/(4m²) is one integer ratio (graph-bounded,
  * no overflow concern at any corpus scale since the kNN graph caps
  * degree). Rank stats are exact: percent_rank = less/(n−1) where
  * `less` is the exclusive prefix count, so every group readout is an
  * integer ratio. (At n² > 2⁶³-scale corpora, aggregate Σless per
  * group in DOUBLE after exact per-partition partials.)
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.9 (graph ops) and §2.13 (feature transforms); siblings
  * lg5 (SurfaceR10j), w8 (WindowsFuncs), m46 (SurfaceR9).
  */
object SurfaceR10ci extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** LG10: MODULARITY — per community from lg5's deterministic
    * label-prop assignment: vertex count, degree sum, intra-community
    * edge count, the community's modularity contribution, and the
    * global Q repeated for gating.
    *
    * Scale shape: degrees and intra-edges are equi-joins of the edge
    * list against the (vertex → community) map, keyed by vertex id,
    * then hash aggs keyed by community — nothing global but two
    * broadcast scalars (m and the Q numerator). Same plan at a billion
    * edges with pre-partitioned labels.
    */
  val lg10Modularity: Q = (s, d) => {
    val und = SurfaceR6h.knnEdges(s, d).localCheckpoint(true)
    val lab = SurfaceR10j.lg5LabelProp(s, d)
      .select(col("vec_id"), col("community")).localCheckpoint(true)
    val mrow = und.agg(count(lit(1)).as("m"))
    val vdeg = und.union(und.select(col("t").as("s"), col("s").as("t")))
      .groupBy("s").agg(count(lit(1)).as("deg"))
      .join(lab, col("s") === col("vec_id"))
      .groupBy("community")
      .agg(count(lit(1)).as("n_vertices"), sum("deg").as("deg_c"))
    val intra = und
      .join(lab.select(col("vec_id").as("s"), col("community").as("ca")), "s")
      .join(lab.select(col("vec_id").as("t"), col("community").as("cb")), "t")
      .where(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("e_c"))
    val per = vdeg.join(intra, Seq("community"), "left")
      .select(col("community"), col("n_vertices"), col("deg_c"),
        coalesce(col("e_c"), lit(0L)).as("e_c"))
      .crossJoin(broadcast(mrow))
      .withColumn("qnum", expr("4 * m * e_c - deg_c * deg_c"))
    val tot = per.agg(sum("qnum").as("qt"))
    per.crossJoin(broadcast(tot))
      .select(col("community"), col("n_vertices"), col("deg_c"), col("e_c"),
        r4(expr("CAST(qnum AS DOUBLE) / (4 * m * m)")).as("q_c"),
        r4(expr("CAST(qt AS DOUBLE) / (4 * m * m)")).as("modularity"))
      .orderBy("community")
  }

  /** M170: RANK-NORMALIZE — map every line's price (in exact cents) to
    * its global percent-rank (rank−1)/(n−1) with min-rank tie
    * semantics, then read out per-returnflag mean/min/max of the
    * transformed feature. The per-flag mean of a rank-uniform feature
    * is ~0.5; a shifted mean is the rank-space analogue of m47's
    * Mann–Whitney effect.
    *
    * Scale shape: facts → distinct-value hash agg (the compression
    * that makes global ranking tractable), PrefixSum's one range
    * exchange + numPartitions-row cumsum for the exclusive counts,
    * then an equi-join back on the value — no global window over fact
    * rows anywhere.
    */
  val m170RankNormalize: Q = (s, d) => {
    val rows = lineitem(s, d).select(col("l_returnflag"),
      expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val values = rows.groupBy("cents").agg(count(lit(1)).as("cnt"))
    val ranked = PrefixSum.withRunningTotal(
        values, Seq("cents"), "cnt", outCol = "cum")
      .select(col("cents"), (col("cum") - col("cnt")).as("less"))
    val nrow = rows.agg(count(lit(1)).as("n"))
    rows.join(ranked, "cents")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum("less").as("sless"),
        min("less").as("minless"), max("less").as("maxless"))
      .crossJoin(broadcast(nrow))
      .select(col("l_returnflag"), col("n_rows"),
        r4(expr("CAST(sless AS DOUBLE) / (n_rows * (n - 1))")).as("mean_pr"),
        r4(expr("CAST(minless AS DOUBLE) / (n - 1)")).as("min_pr"),
        r4(expr("CAST(maxless AS DOUBLE) / (n - 1)")).as("max_pr"))
      .orderBy("l_returnflag")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lg10_modularity" -> lg10Modularity,
    "m170_rank_normalize" -> m170RankNormalize)

  private def modularitySql: String = {
    val r = SurfaceR10j.lpRounds
    val edges = SurfaceR6h.knnEdgesCte
      .replace("e AS (", "e AS MATERIALIZED (")
    s"""WITH $edges,
       |adj AS MATERIALIZED (SELECT s, t FROM e UNION ALL SELECT t, s FROM e),
       |l0 AS MATERIALIZED (SELECT DISTINCT s AS v, s AS lbl FROM adj),
       |${SurfaceR10j.lpRoundsSql(r, mat = true)},
       |lab AS MATERIALIZED (SELECT v, lbl AS community FROM l$r),
       |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
       |vdeg AS (
       |  SELECT community, CAST(count(*) AS BIGINT) AS n_vertices,
       |    CAST(sum(deg) AS BIGINT) AS deg_c
       |  FROM (SELECT s AS v, CAST(count(*) AS BIGINT) AS deg
       |        FROM adj GROUP BY 1) dv
       |  JOIN lab USING (v) GROUP BY 1),
       |intra AS (
       |  SELECT a.community, CAST(count(*) AS BIGINT) AS e_c
       |  FROM e JOIN lab a ON e.s = a.v JOIN lab b ON e.t = b.v
       |  WHERE a.community = b.community GROUP BY 1),
       |per AS (
       |  SELECT vdeg.community, n_vertices, deg_c,
       |    coalesce(e_c, 0) AS e_c, m,
       |    4 * m * coalesce(e_c, 0) - deg_c * deg_c AS qnum
       |  FROM vdeg LEFT JOIN intra ON vdeg.community = intra.community
       |  CROSS JOIN mm),
       |tot AS (SELECT CAST(sum(qnum) AS BIGINT) AS qt FROM per)
       |SELECT community, n_vertices, deg_c, CAST(e_c AS BIGINT) AS e_c,
       |  round(CAST(qnum AS DOUBLE) / (4 * m * m), 4) AS q_c,
       |  round(CAST(qt AS DOUBLE) / (4 * m * m), 4) AS modularity
       |FROM per CROSS JOIN tot ORDER BY community""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "lg10_modularity" -> modularitySql,
    "m170_rank_normalize" ->
      """WITH v AS (
        |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT cents,
        |    CAST(sum(cnt) OVER (ORDER BY cents) AS BIGINT) - cnt AS less
        |  FROM v),
        |nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM v),
        |r AS (
        |  SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        |  round(CAST(sum(less) AS DOUBLE) / (count(*) * (n - 1)), 4)
        |    AS mean_pr,
        |  round(CAST(min(less) AS DOUBLE) / (n - 1), 4) AS min_pr,
        |  round(CAST(max(less) AS DOUBLE) / (n - 1), 4) AS max_pr
        |FROM r JOIN c USING (cents) CROSS JOIN nn
        |GROUP BY l_returnflag, n ORDER BY l_returnflag""".stripMargin)
}
