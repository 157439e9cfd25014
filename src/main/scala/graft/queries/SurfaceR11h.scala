package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 surface batch 8: lasso regression via cyclic coordinate
  * descent — the sparse linear model, fit distributed and replayed
  * exactly.
  *
  * Contrast with near-siblings: m5/m60 fit UNPENALIZED least squares,
  * m168 traces the RIDGE path (L2 — closed form, never sparse); the
  * L1 penalty has no closed form and is THE standard route to feature
  * selection in linear models. m51/m66 select features by univariate
  * screens; lasso selects them jointly inside the fit.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.13 (modeling). Method: Friedman, Hastie, Tibshirani
  * 2010 (coordinate descent for generalized linear models), cyclic
  * order, fixed λ, 2 full sweeps.
  */
object SurfaceR11h extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val P = 8
  private val SWEEPS = 2
  private val LAM = "0.05"

  // ---- shared arithmetic text (both engines run these exact strings) ----

  /** The ONLY engine-divergent fragment: Spark's `arr[i]` is 0-based,
    * DuckDB's 1-based — so the accessor is parameterized
    * (`element_at` is 1-based on Spark) and every other string is
    * shared verbatim. */
  private def qxCols(at: Int => String): Seq[String] = (1 to P).map(j =>
    s"CAST(floor(CAST(${at(j)} AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qx$j")
  private val qyCol =
    "CAST(floor(CAST(label AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS qy"
  private def muSd(j: Int): Seq[String] = {
    val mu = s"CAST(sum(qx$j) AS DOUBLE) / (count(*) * 1000000.0)"
    Seq(s"$mu AS mu$j",
      s"sqrt(CAST(sum(qx$j*qx$j) AS DOUBLE) / (count(*) * 1e12)" +
        s" - ($mu) * ($mu)) AS sd$j")
  }
  private val myCol = "CAST(sum(qy) AS DOUBLE) / (count(*) * 1000000.0) AS my"
  private def zCols: Seq[String] = (1 to P).map(j =>
    s"(CAST(qx$j AS DOUBLE) / 1000000 - mu$j) / sd$j AS z$j")
  private val ycCol = "CAST(qy AS DOUBLE) / 1000000 - my AS yc"
  private def dCols: Seq[String] = (1 to P).map(j =>
    s"CAST(sum(CAST(floor(z$j * z$j * 1000000000 + 0.5) AS BIGINT)) AS DOUBLE)" +
      s" / (1000000000.0 * count(*)) AS d$j")
  private val dot = (1 to P).map(j => s"z$j * b$j").mkString(" + ")
  private def rhoExpr(i: Int, j: Int): String =
    s"CAST(sum(CAST(floor(z$j * (yc - ($dot) + z$j * b$j) * 1000000000 + 0.5)" +
      s" AS BIGINT)) AS DOUBLE) / (1000000000.0 * count(*)) AS rho$i"
  private def softThreshold(i: Int, j: Int): String =
    s"floor((CASE WHEN rho$i > $LAM THEN (rho$i - $LAM) / d$j" +
      s" WHEN rho$i < -$LAM THEN (rho$i + $LAM) / d$j" +
      s" ELSE 0.0 END) * 1000000000 + 0.5) / 1000000000 AS b$j"

  /** M207: LASSO (λ=0.05) BY CYCLIC COORDINATE DESCENT — the first 8
    * embedding dims standardized, the class label centered as the
    * target; 2 full sweeps of the soft-threshold update
    * βⱼ ← S(ρⱼ, λ)/dⱼ with ρⱼ the partial-residual correlation.
    *
    * Determinism (the m204 discipline): raw floats are quantized to
    * the 1e-6 integer grid BEFORE any moment sum, so means/sds are
    * exact-integer reductions; each per-row correlation term z·res is
    * quantized to 1e-9 before the across-row sum; β re-enters each
    * step on the 1e-9 grid. The oracle unrolls the identical 16 steps
    * as MATERIALIZED CTEs. Scale shape per step: one narrow aggregate
    * over the persisted standardized table under a broadcast 1-row β —
    * 16 cheap passes, no shuffle beyond the partial-agg tree;
    * lineage cut per step. Output: (feature, beta, is_zero) — the
    * sparsity pattern is the point. */
  val m207LassoCd: Q = (s, d) => {
    val q = embeddings(s, d)
      .selectExpr(qxCols(j => s"element_at(embedding, $j)") :+ qyCol: _*)
    val mom = q.selectExpr((1 to P).flatMap(muSd) :+ myCol: _*)
    val zt = q.crossJoin(broadcast(mom))
      .selectExpr(zCols :+ ycCol: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dd = zt.selectExpr(dCols: _*)
    var b = s.range(1).selectExpr((1 to P).map(j =>
      s"CAST(0.0 AS DOUBLE) AS b$j"): _*)
    var i = 0
    for (_ <- 1 to SWEEPS; j <- 1 to P) {
      val rho = zt.crossJoin(broadcast(b)).selectExpr(rhoExpr(i, j))
      b = b.crossJoin(broadcast(rho)).crossJoin(broadcast(dd))
        .selectExpr((1 to P).map(k =>
          if (k == j) softThreshold(i, j) else s"b$k"): _*)
        .localCheckpoint(true)
      i += 1
    }
    b.selectExpr(
        s"posexplode(array(${(1 to P).map(j => s"b$j").mkString(", ")}))" +
          " AS (idx, beta)")
      .selectExpr("CAST(idx + 1 AS BIGINT) AS feature",
        "round(beta, 6) AS beta", "beta = 0.0 AS is_zero")
      .orderBy("feature")
  }

  private def lassoSql: String = {
    val steps = (0 until SWEEPS * P).map { i =>
      val j = i % P + 1
      val bsel = (1 to P).map(k =>
        if (k == j) softThreshold(i, j) else s"b$k").mkString(", ")
      s"""rhoc$i AS MATERIALIZED (
         |  SELECT ${rhoExpr(i, j)}
         |  FROM zt CROSS JOIN s$i),
         |s${i + 1} AS MATERIALIZED (
         |  SELECT $bsel FROM s$i CROSS JOIN rhoc$i CROSS JOIN dd)""".stripMargin
    }.mkString(",\n")
    val readout = (1 to P).map(j =>
      s"SELECT CAST($j AS BIGINT) AS feature, round(b$j, 6) AS beta," +
        s" b$j = 0.0 AS is_zero FROM s${SWEEPS * P}").mkString("\nUNION ALL ")
    s"""WITH q AS MATERIALIZED (
       |  SELECT ${qxCols(j => s"embedding[$j]").mkString(",\n    ")},
       |    $qyCol
       |  FROM embeddings),
       |mom AS MATERIALIZED (
       |  SELECT ${(1 to P).flatMap(muSd).mkString(",\n    ")},
       |    $myCol
       |  FROM q),
       |zt AS MATERIALIZED (
       |  SELECT ${zCols.mkString(",\n    ")},
       |    $ycCol
       |  FROM q CROSS JOIN mom),
       |dd AS MATERIALIZED (SELECT ${dCols.mkString(",\n    ")} FROM zt),
       |s0 AS (SELECT ${(1 to P).map(j => s"CAST(0.0 AS DOUBLE) AS b$j").mkString(", ")}),
       |$steps
       |$readout
       |ORDER BY feature""".stripMargin
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m207_lasso_cd" -> m207LassoCd)

  val oracleSql: Map[String, String] = Map(
    "m207_lasso_cd" -> lassoSql)
}
