package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-12 surface batch 8: reliable checkpointing and Wilson
  * proportion intervals —
  *
  *  - x21 RELIABLE CHECKPOINT: the repo uses `localCheckpoint` in 66
  *    places (lineage cut, executor-LOCAL blocks), but the
  *    fault-tolerant variant — `sparkContext.setCheckpointDir` +
  *    `Dataset.checkpoint(eager)` writing to reliable storage — is the
  *    one a 1000-executor iterative job actually needs: local
  *    checkpoint blocks DIE with their executor, reliable checkpoints
  *    survive any loss and truncate lineage for real. The query proves
  *    the checkpointed frame re-reads from files (isCheckpointed) and
  *    produces bit-identical analytics.
  *  - m211 WILSON SCORE INTERVAL: q23 reports a z-TEST for an A/B
  *    difference; nothing provides interval ESTIMATION for a single
  *    proportion — and the naive Wald interval collapses at extreme
  *    p̂/small n, which is why Wilson is the production default. All
  *    inputs are exact integer counts; `sqrt` is IEEE correctly-
  *    rounded (unlike exp/ln it is bit-identical cross-engine on the
  *    same input), so the shared formula text needs no quantization.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.12 (engine surface), §2.13 (evaluation).
  */
object SurfaceR12h extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** One stable per-JVM checkpoint root (ADVICE r12: the per-invocation
    * dir left the session's checkpoint dir dangling after exit-cleanup
    * when no prior dir existed — SparkContext has no unset API). Every
    * x21 call points the session here; Spark writes each checkpoint
    * into its own UUID subdir, and the whole root dies with the JVM. */
  private lazy val ckptRoot: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_root_").toString
    graft.QueryGuard.deleteRecOnExit(new java.io.File(dir))
    dir
  }

  /** X21: reliable checkpoint mid-pipeline. The checkpoint root is
    * JVM-stable and cleaned on exit; the aggregate downstream of the
    * checkpoint must equal the oracle's straight-through computation —
    * any loss/duplication through the file round-trip fails the hash. */
  val x21ReliableCheckpoint: Q = (s, d) => {
    s.sparkContext.setCheckpointDir(ckptRoot)
    val enriched = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderpriority"),
        expr("CAST(floor(o_totalprice * 1e4 + 5e-1) AS BIGINT)").as("qprice"))
      .checkpoint(eager = true)
    // the eager checkpoint rewrites the plan onto the written files —
    // an RDD/file scan at the root, no parquet relation left
    require(!enriched.queryExecution.optimizedPlan.toString.contains("Relation"),
      "x21: checkpoint did not truncate the lineage")
    val out = enriched.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        r4(expr("CAST(sum(qprice) AS DOUBLE) / 1e4")).as("revenue"),
        countDistinct("o_orderpriority").as("n_priorities"))
      .orderBy("c_mktsegment")
    out
  }

  /** M211: Wilson 95% score interval for P(o_orderstatus = 'F') per
    * order priority — lower/upper bounds plus the Wald half-width for
    * contrast (Wilson never exits [0,1]; Wald does at the extremes).
    *
    * ADVICE r12: z*z as two literals diverged 1 ulp cross-engine
    * (DuckDB squares the DECIMAL literal exactly before double
    * promotion → ...125; the JVM squares the rounded double → ...1254).
    * Fix: z² is a SINGLE shared literal, explicitly cast to DOUBLE in
    * both texts so neither engine re-derives it, and z itself is
    * likewise pinned to DOUBLE for the sqrt multiplier. */
  val m211WilsonCi: Q = (s, d) => {
    val z = "CAST(1.959963984540054 AS DOUBLE)" // Φ⁻¹(0.975)
    val z2 = "CAST(3.8414588206941254 AS DOUBLE)" // z² squared in double
    orders(s, d).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("c"))
      .selectExpr("o_orderpriority", "n", "c",
        "CAST(c AS DOUBLE) / n AS p")
      .selectExpr("o_orderpriority", "n", "c",
        s"(p + $z2 / (2 * n) - $z * sqrt(p * (1 - p) / n" +
          s" + $z2 / (4 * n * n))) / (1 + $z2 / n) AS lo",
        s"(p + $z2 / (2 * n) + $z * sqrt(p * (1 - p) / n" +
          s" + $z2 / (4 * n * n))) / (1 + $z2 / n) AS hi",
        "p")
      .select(col("o_orderpriority"), col("n"), col("c"),
        r4(col("p")).as("p_hat"), r4(col("lo")).as("wilson_lo"),
        r4(col("hi")).as("wilson_hi"))
      .orderBy("o_orderpriority")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "x21_reliable_checkpoint" -> x21ReliableCheckpoint,
    "m211_wilson_ci" -> m211WilsonCi)

  val oracleSql: Map[String, String] = Map(
    "x21_reliable_checkpoint" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  round(CAST(CAST(sum(CAST(floor(o_totalprice * 1e4 + 5e-1) AS BIGINT))
        |    AS BIGINT) AS DOUBLE) / 1e4, 4) AS revenue,
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "m211_wilson_ci" ->
      """WITH agg AS (
        |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |p0 AS (SELECT o_orderpriority, n, c, CAST(c AS DOUBLE) / n AS p
        |       FROM agg)
        |SELECT o_orderpriority, n, c,
        |  round(p, 4) AS p_hat,
        |  round((p + CAST(3.8414588206941254 AS DOUBLE) / (2 * n)
        |    - CAST(1.959963984540054 AS DOUBLE) * sqrt(p * (1 - p) / n
        |      + CAST(3.8414588206941254 AS DOUBLE) / (4 * n * n)))
        |    / (1 + CAST(3.8414588206941254 AS DOUBLE) / n), 4) AS wilson_lo,
        |  round((p + CAST(3.8414588206941254 AS DOUBLE) / (2 * n)
        |    + CAST(1.959963984540054 AS DOUBLE) * sqrt(p * (1 - p) / n
        |      + CAST(3.8414588206941254 AS DOUBLE) / (4 * n * n)))
        |    / (1 + CAST(3.8414588206941254 AS DOUBLE) / n), 4) AS wilson_hi
        |FROM p0 ORDER BY o_orderpriority""".stripMargin)
}
