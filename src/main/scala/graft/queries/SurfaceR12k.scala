package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 surface batch 11: K-TRUSS peeling on the kNN graph.
  *
  * Contrast with the graph family: lg2 COUNTS triangles per vertex,
  * lg8 peels VERTICES by degree (k-core), lg15 peels EDGES by
  * triangle support — an edge survives a round iff it closes ≥ K−2
  * triangles in the CURRENT subgraph. The 4-truss keeps exactly the
  * edges embedded in locally dense pockets and is the standard
  * community-backbone extractor one level finer than k-core (every
  * k-truss edge is in the (k−1)-core, not vice versa). In the dedup
  * setting: k-truss edges connect documents whose NEIGHBORS also
  * near-duplicate each other — merge-cluster backbones, not chance
  * pairings.
  *
  * Shape: per round, support = the lg2 oriented edge-pair join
  * (fanout bounded by kNN degree), filter, localCheckpoint — the lg8
  * bounded-rounds discipline (3 peels, fixed plan depth; the census
  * readout makes convergence VISIBLE instead of assumed). The oracle
  * is the identical chain unrolled from the same (K, ROUNDS)
  * constants, every multiply-referenced CTE pinned MATERIALIZED
  * (DuckDB re-expands plain CTEs exponentially — the lg8 lesson).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (graph family).
  */
object SurfaceR12k extends QueryBatch {

  type Q = (SparkSession, String) => DataFrame

  private val K = 4
  private val ROUNDS = 3

  val lg15Ktruss: Q = (s, d) => {
    def sup(e: DataFrame): DataFrame = {
      val und = e.select(col("s").as("a"), col("t").as("b"))
        .union(e.select(col("t").as("a"), col("s").as("b")))
      e.join(und.toDF("xa", "xb"), col("xa") === col("s"))
        .join(und.toDF("ya", "yb"),
          col("ya") === col("t") && col("yb") === col("xb"))
        .groupBy("s", "t").agg(count(lit(1)).as("c"))
    }
    def census(round: Int, e: DataFrame, supE: DataFrame): DataFrame =
      e.agg(count(lit(1)).as("n_edges"))
        .crossJoin(broadcast(
          supE.agg(coalesce(sum("c"), lit(0L)).as("support_sum"))))
        .select(lit(round.toLong).as("round"), col("n_edges"),
          col("support_sum"))
    var e = SurfaceR6h.knnEdges(s, d).localCheckpoint(true)
    var se = sup(e).localCheckpoint(true)
    var out = census(0, e, se)
    for (r <- 1 to ROUNDS) {
      // zero-support edges never reach `se` (inner join), so the
      // filter drops them along with the sub-threshold ones
      e = se.where(col("c") >= K - 2).select("s", "t").localCheckpoint(true)
      se = sup(e).localCheckpoint(true)
      out = out.union(census(r, e, se))
    }
    out.orderBy("round")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lg15_ktruss" -> lg15Ktruss)

  /** Oracle chain generated from the SAME (K, ROUNDS) constants. */
  private def ktrussSql: String = {
    val rounds = (0 to ROUNDS).map { r =>
      val eDef =
        if (r == 0) "SELECT s, t FROM e"
        else s"SELECT s, t FROM s${r - 1} WHERE c >= ${K - 2}"
      s"""e$r AS MATERIALIZED ($eDef),
         |u$r AS MATERIALIZED (
         |  SELECT s AS a, t AS b FROM e$r
         |  UNION ALL SELECT t AS a, s AS b FROM e$r),
         |s$r AS MATERIALIZED (
         |  SELECT e$r.s, e$r.t, CAST(count(*) AS BIGINT) AS c
         |  FROM e$r
         |  JOIN u$r x ON x.a = e$r.s
         |  JOIN u$r y ON y.a = e$r.t AND y.b = x.b
         |  GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    val readout = (0 to ROUNDS).map { r =>
      s"""SELECT $r AS round,
         |  (SELECT CAST(count(*) AS BIGINT) FROM e$r) AS n_edges,
         |  (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM s$r)
         |    AS support_sum""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${SurfaceR6h.knnEdgesCte},
       |$rounds
       |SELECT CAST(round AS BIGINT) AS round, n_edges, support_sum
       |FROM ($readout) ORDER BY round""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "lg15_ktruss" -> ktrussSql)
}
