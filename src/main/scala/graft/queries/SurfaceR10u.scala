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
object SurfaceR10u {
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

  // ---- M95: PowerIterationClustering ----

  /** M95: POWER ITERATION CLUSTERING — PIC over the lg2 kNN graph
    * (cosine similarities as affinities, degree init: deterministic
    * start, float-iterative convergence → no SQL oracle; rows-checked
    * by the driver and law-checked in the spec: every even-id vertex
    * assigned, k clusters non-empty, and the l2b-confirmed near-dup
    * pair lands in one cluster). PIC is the MLlib-native route to the
    * same "cluster the similarity graph" goal lc/lc2 reach with
    * hash-min components — components need an actual edge threshold,
    * PIC only relative affinities. The input is the bounded edge list;
    * each power iteration is one shuffle keyed by vertex. */
  val m95PowerIteration: Q = (s, d) => {
    val edges = SurfaceR6h.knnEdges(s, d)
      .select(col("s").as("src"), col("t").as("dst"), lit(1.0).as("weight"))
    val pic = new PowerIterationClustering()
      .setK(4).setMaxIter(20).setInitMode("degree").setWeightCol("weight")
    pic.assignClusters(edges)
      .select(col("id").as("vec_id"), col("cluster"))
      .orderBy("vec_id")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m94_vector_indexer" -> m94VectorIndexer,
    "m95_power_iteration" -> m95PowerIteration)

  val oracleSql: Map[String, String] = Map(
    // m95 intentionally absent: float-iterative fit (declared no-oracle)
    "m94_vector_indexer" ->
      """SELECT l_orderkey * 8 + l_linenumber AS rid,
        |  CAST(l_linenumber - 1 AS BIGINT) AS ln_idx,
        |  round(l_quantity, 4) AS q_pass
        |FROM lineitem ORDER BY rid""".stripMargin)
}
