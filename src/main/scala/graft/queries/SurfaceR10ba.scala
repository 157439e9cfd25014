package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 53: clustering evaluation — the silhouette
  * score ((b−a)/max(a,b): does each point sit closer to its own
  * cluster than to the nearest other one), computed on a bounded
  * probe sample exactly the way production evaluates silhouette at
  * scale (all-pairs on the full corpus is quadratic; sampled
  * silhouette is the standard answer, and the sample here is
  * deterministic).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.13 (ML evaluation; completes m6/m30/m38/m39's
  * clustering family with its intrinsic quality metric).
  */
object SurfaceR10ba extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M138: SILHOUETTE — per label-cluster mean silhouette over the
    * vec_id%5 probe set. Distances follow the m30 integer idiom:
    * dims quantized to 1e-4 integers, d²(a,b) = |a|² + |b|² − 2a·b
    * from EXACT integer norms/dots (the pairwise join is on the
    * bounded probe, per-dimension equi-join — never corpus×corpus),
    * and only the final sqrt/means touch floats. Singleton clusters
    * report silhouette 0 (stated convention). */
  val m138Silhouette: Q = (s, d) => {
    val dims = embeddings(s, d)
      .where(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("label").cast("long").as("cl"),
        posexplode(col("embedding")).as(Seq("i", "v")))
      .withColumn("q", expr("CAST(floor(CAST(v AS DOUBLE) * 1e4 + 5e-1) AS BIGINT)"))
      .select("vec_id", "cl", "i", "q")
    val norms = dims.groupBy("vec_id", "cl").agg(sum(expr("q * q")).as("nv"))
    val dots = dims.as("a")
      .join(dims.as("b"),
        col("a.i") === col("b.i") && col("a.vec_id") =!= col("b.vec_id"))
      .groupBy(col("a.vec_id").as("va"), col("a.cl").as("ca"),
        col("b.vec_id").as("vb"), col("b.cl").as("cb"))
      .agg(sum(expr("a.q * b.q")).as("dot"))
    val dist = dots
      .join(broadcast(norms.select(col("vec_id").as("va"), col("nv").as("na"))), "va")
      .join(broadcast(norms.select(col("vec_id").as("vb"), col("nv").as("nb"))), "vb")
      .select(col("va"), col("ca"), col("cb"),
        sqrt(expr("CAST(na + nb - 2 * dot AS DOUBLE)")).as("dd"))
    val perVecCl = dist.groupBy("va", "ca", "cb").agg(avg("dd").as("md"))
    val sil = perVecCl.groupBy("va", "ca")
      .agg(max(when(col("cb") === col("ca"), col("md"))).as("ai"),
        min(when(col("cb") =!= col("ca"), col("md"))).as("bi"))
      .select(col("ca"),
        when(col("ai").isNull, lit(0.0))
          .otherwise((col("bi") - col("ai")) / greatest(col("ai"), col("bi")))
          .as("sv"))
    sil.groupBy(col("ca").as("cluster"))
      .agg(count(lit(1)).as("n_vecs"), r4(avg("sv")).as("mean_silhouette"))
      .orderBy("cluster")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m138_silhouette" -> m138Silhouette)

  val oracleSql: Map[String, String] = Map(
    "m138_silhouette" ->
      """WITH dims AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS cl, i,
        |    CAST(floor(CAST(list_extract(embedding, CAST(i + 1 AS INT)) AS DOUBLE)
        |               * 1e4 + 5e-1) AS BIGINT) AS q
        |  FROM embeddings CROSS JOIN range(64) AS t(i)
        |  WHERE vec_id % 5 = 0),
        |norms AS (
        |  SELECT vec_id, cl, CAST(sum(q * q) AS BIGINT) AS nv
        |  FROM dims GROUP BY 1, 2),
        |dots AS (
        |  SELECT a.vec_id AS va, a.cl AS ca, b.vec_id AS vb, b.cl AS cb,
        |    CAST(sum(a.q * b.q) AS BIGINT) AS dot
        |  FROM dims a JOIN dims b
        |    ON a.i = b.i AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2, 3, 4),
        |dist AS (
        |  SELECT va, ca, cb,
        |    sqrt(CAST(za.nv + zb.nv - 2 * dot AS DOUBLE)) AS dd
        |  FROM dots
        |  JOIN norms za ON za.vec_id = va
        |  JOIN norms zb ON zb.vec_id = vb),
        |pvc AS (
        |  SELECT va, ca, cb, avg(dd) AS md FROM dist GROUP BY 1, 2, 3),
        |sil AS (
        |  SELECT va, ca,
        |    max(CASE WHEN cb = ca THEN md END) AS ai,
        |    min(CASE WHEN cb <> ca THEN md END) AS bi
        |  FROM pvc GROUP BY 1, 2),
        |sv AS (
        |  SELECT ca,
        |    CASE WHEN ai IS NULL THEN 0.0
        |         ELSE (bi - ai) / greatest(ai, bi) END AS sv
        |  FROM sil)
        |SELECT ca AS cluster, CAST(count(*) AS BIGINT) AS n_vecs,
        |  round(avg(sv), 4) AS mean_silhouette
        |FROM sv GROUP BY 1 ORDER BY 1""".stripMargin)
}
