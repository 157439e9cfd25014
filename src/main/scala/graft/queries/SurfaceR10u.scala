package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{VectorAssembler, VectorIndexer}
import org.apache.spark.ml.clustering.PowerIterationClustering
import org.apache.spark.ml.functions.vector_to_array

import graft.{Orc, Tables}

/** Round-10 surface batch 21: the last two uncovered MLlib surfaces —
  * VectorIndexer (automatic categorical-feature detection, the
  * preprocessing step tree ensembles expect) and
  * PowerIterationClustering (graph clustering by power iteration on
  * the normalized affinity matrix).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.14 (MLlib parity).
  */
object SurfaceR10u extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M94: VectorIndexer ----

  /** M94: VECTOR INDEXER — maxCategories=10 over the assembled
    * (linenumber, quantity) vector: linenumber (7 distinct values) is
    * detected categorical and value-sorted to indices 0..6, quantity
    * (50 distinct) passes through continuous. The oracle reproduces
    * the DOCUMENTED mapping — ascending value order, verified against
    * the fitted model's categoryMaps in the spec — so the transformer
    * itself is hash-checked, not just law-checked. Fit cost is one
    * distinct-count pass; transform is narrow. */
  val m94VectorIndexer: Q = (s, d) => {
    val li = lineitem(s, d).select(
      (col("l_orderkey") * 8 + col("l_linenumber")).as("rid"),
      col("l_linenumber").cast("double").as("ln"),
      col("l_quantity").as("q"))
    val va = new VectorAssembler()
      .setInputCols(Array("ln", "q")).setOutputCol("f")
    val vi = new VectorIndexer().setInputCol("f").setOutputCol("idx")
      .setMaxCategories(10)
    val assembled = va.transform(li)
    vi.fit(assembled).transform(assembled)
      .select(col("rid"),
        element_at(vector_to_array(col("idx")), 1).cast("long").as("ln_idx"),
        r4(element_at(vector_to_array(col("idx")), 2)).as("q_pass"))
      .orderBy("rid")
  }

  // ---- M95: power-iteration clustering ----

  /** Power-iteration sweeps; the oracle unrolls exactly this many. */
  private[queries] val PI_ROUNDS = 8

  /** M95: POWER-ITERATION CLUSTERING over the lg2 kNN graph — the PIC
    * algorithm (Lin & Cohen, ICML 2010): power iteration on the
    * row-normalized affinity matrix W = D⁻¹A from the degree vector,
    * stopped early so the slow-mixing pseudo-eigenvector still separates
    * components, then a k=4 cut of the sorted values. This row was
    * `no_oracle` through round 10 (it wrapped MLlib's float-iterative
    * PIC + k-means); VERDICT r10 asked for the exact-replay flip, so
    * the fit is now native and EXACT: the iterate lives in BIGINT
    * micro-units (v₀ = deg·10⁶), each sweep is the round-half-up
    * integer division (2·Σ_{j∈N(i)} v_j + deg_i) div (2·deg_i), and the
    * k-means step becomes the deterministic largest-gap cut — the k−1
    * widest gaps (ties → lower position) in the sorted distinct values
    * split the vertices into ≤ k clusters. Zero float ops ⇒ the DuckDB
    * replay hash-matches. MLlib's PowerIterationClustering itself stays
    * law-tested in SurfaceR10uSpec (same graph, agreement laws), so the
    * MLlib-parity surface is still exercised.
    *
    * Scale shape: each sweep is one equi-join + one hash agg keyed by
    * vertex (eager localCheckpoint pins constant plan depth, like
    * lg_pagerank); the cut value-compresses to DISTINCT iterate values
    * (GlobalRowId range-partition ordinal — no global window over the
    * vertex set), gap top-3 is a TakeOrdered of the value table, and the
    * assignment is an equi-join on value + one broadcast scalar array.
    */
  val m95PowerIteration: Q = (s, d) => {
    val und = SurfaceR6h.knnEdges(s, d)
    val adj = und.union(und.select(col("t").as("s"), col("s").as("t")))
      .localCheckpoint(true)
    val deg = adj.groupBy("s").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    var v = deg.select(col("s").as("v"), (col("deg") * 1000000L).as("vq"))
    for (_ <- 1 to PI_ROUNDS) {
      val sums = adj.join(v.select(col("v").as("t"), col("vq")), "t")
        .groupBy("s").agg(sum("vq").as("sv"))
      v = sums.join(deg, "s")
        .select(col("s").as("v"), expr("(sv * 2 + deg) div (deg * 2)").as("vq"))
        .localCheckpoint(true)
    }
    val vals = graft.operators.GlobalRowId.withRowId(
      v.select("vq").distinct(), "vq", outCol = "idx")
    val gaps = vals.as("lo")
      .join(vals.as("hi"), col("hi.idx") === col("lo.idx") + 1)
      .select(col("hi.idx").as("b"), (col("hi.vq") - col("lo.vq")).as("gap"))
    val cuts = gaps.orderBy(col("gap").desc, col("b").asc).limit(3)
      .agg(sort_array(collect_list(col("b"))).as("bs"))
    v.join(vals, "vq")
      .crossJoin(broadcast(cuts))
      .select(col("v").as("vec_id"),
        expr("CAST(size(filter(bs, b -> b <= idx)) AS INT)").as("cluster"))
      .orderBy("vec_id")
  }

  /** Unrolled integer power-iteration sweeps for the oracle — identical
    * round-half-up divisions as the Spark loop; MATERIALIZED because
    * each sweep re-references adj/dg and DuckDB would otherwise
    * re-expand the kNN pipeline per round (the lg8 OOM lesson). */
  private def piRoundsSql(k: Int): String =
    (0 until k).map { i =>
      s"""sm$i AS MATERIALIZED (
         |  SELECT adj.s AS v, CAST(sum(p.vq) AS BIGINT) AS sv
         |  FROM adj JOIN p$i p ON p.v = adj.t GROUP BY 1),
         |p${i + 1} AS MATERIALIZED (
         |  SELECT sm$i.v,
         |    CAST((sv * 2 + dg.deg) // (dg.deg * 2) AS BIGINT) AS vq
         |  FROM sm$i JOIN dg ON dg.v = sm$i.v)""".stripMargin
    }.mkString(",\n")

  private def powerIterSql: String = {
    val edges = SurfaceR6h.knnEdgesCte
      .replace("e AS (", "e AS MATERIALIZED (")
    s"""WITH $edges,
       |adj AS MATERIALIZED (SELECT s, t FROM e UNION ALL SELECT t, s FROM e),
       |dg AS MATERIALIZED (
       |  SELECT s AS v, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
       |p0 AS MATERIALIZED (
       |  SELECT v, CAST(deg * 1000000 AS BIGINT) AS vq FROM dg),
       |${piRoundsSql(PI_ROUNDS)},
       |vals AS MATERIALIZED (
       |  SELECT vq, dense_rank() OVER (ORDER BY vq) - 1 AS idx
       |  FROM (SELECT DISTINCT vq FROM p$PI_ROUNDS)),
       |gaps AS (
       |  SELECT hi.idx AS b, hi.vq - lo.vq AS gap
       |  FROM vals hi JOIN vals lo ON hi.idx = lo.idx + 1),
       |top3 AS (SELECT b FROM gaps ORDER BY gap DESC, b LIMIT 3)
       |SELECT p.v AS vec_id,
       |  CAST((SELECT count(*) FROM top3 WHERE top3.b <= vals.idx) AS INT)
       |    AS cluster
       |FROM p$PI_ROUNDS p JOIN vals ON vals.vq = p.vq
       |ORDER BY vec_id""".stripMargin
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m94_vector_indexer" -> m94VectorIndexer,
    "m95_power_iteration" -> m95PowerIteration)

  val oracleSql: Map[String, String] = Map(
    "m94_vector_indexer" ->
      """SELECT l_orderkey * 8 + l_linenumber AS rid,
        |  CAST(l_linenumber - 1 AS BIGINT) AS ln_idx,
        |  round(l_quantity, 4) AS q_pass
        |FROM lineitem ORDER BY rid""".stripMargin,
    "m95_power_iteration" -> powerIterSql)
}
