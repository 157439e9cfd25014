package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 47: experiment covariate balance + leakage-
  * safe feature engineering — standardized mean differences across the
  * m129 assignment arms (the pre-experiment health check: randomization
  * should equalize covariates; |SMD| > 0.1 is the usual alarm) and
  * leave-one-out target encoding (the tabular-ML categorical encoder
  * that keeps a row's own label out of its feature — the encoding
  * naive mean-encoding leaks through).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 (A/B analytics), §2.12 (feature pipeline).
  */
object SurfaceR10au extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M131: standardized mean difference ----

  private def smdSql(s1: String, q1: String, n1: String,
      s2: String, q2: String, n2: String): String = {
    val m1 = s"(CAST($s1 AS DOUBLE) / $n1)"
    val m2 = s"(CAST($s2 AS DOUBLE) / $n2)"
    val v1 = s"((CAST($q1 AS DOUBLE) - CAST($s1 AS DOUBLE) * $s1 / $n1) / ($n1 - 1))"
    val v2 = s"((CAST($q2 AS DOUBLE) - CAST($s2 AS DOUBLE) * $s2 / $n2) / ($n2 - 1))"
    s"(($m1 - $m2) / sqrt(($v1 + $v2) / 2.0))"
  }

  /** M131: COVARIATE BALANCE — SMD of account balance (cents) and
    * nation key between arms A and B of the m129 md5 split:
    * (x̄₁−x̄₂)/√((s₁²+s₂²)/2). A hash split is randomization, so both
    * SMDs must sit near 0 — a drifted value means the hash key leaks
    * the covariate (e.g. splitting on a key correlated with tenure).
    * Per-arm (n, Σx, Σx²) are exact integers from ONE conditional
    * aggregate pass; both SMDs share one formula text. */
  val m131SmdBalance: Q = (s, d) => {
    val nib =
      "(instr('0123456789abcdef', substr(md5(concat(c_custkey, ':srm')), 1, 1)) - 1)"
    customer(s, d)
      .select(
        expr(s"CASE WHEN $nib < 8 THEN 'A' WHEN $nib < 12 THEN 'B' ELSE 'C' END")
          .as("arm"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("bal"),
        col("c_nationkey").cast("long").as("nlen"))
      .agg(
        sum(expr("CASE WHEN arm = 'A' THEN 1 ELSE 0 END")).as("na"),
        sum(expr("CASE WHEN arm = 'B' THEN 1 ELSE 0 END")).as("nb"),
        sum(expr("CASE WHEN arm = 'A' THEN bal ELSE 0 END")).as("sba"),
        sum(expr("CASE WHEN arm = 'B' THEN bal ELSE 0 END")).as("sbb"),
        sum(expr("CASE WHEN arm = 'A' THEN bal * bal ELSE 0 END")).as("qba"),
        sum(expr("CASE WHEN arm = 'B' THEN bal * bal ELSE 0 END")).as("qbb"),
        sum(expr("CASE WHEN arm = 'A' THEN nlen ELSE 0 END")).as("sla"),
        sum(expr("CASE WHEN arm = 'B' THEN nlen ELSE 0 END")).as("slb"),
        sum(expr("CASE WHEN arm = 'A' THEN nlen * nlen ELSE 0 END")).as("qla"),
        sum(expr("CASE WHEN arm = 'B' THEN nlen * nlen ELSE 0 END")).as("qlb"))
      .select(col("na"), col("nb"),
        r4(expr(smdSql("sba", "qba", "na", "sbb", "qbb", "nb"))).as("smd_acctbal"),
        r4(expr(smdSql("sla", "qla", "na", "slb", "qlb", "nb"))).as("smd_nation"))
  }

  // ---- M132: leave-one-out target encoding ----

  /** M132: LOO TARGET ENCODING — encode market segment by the mean of
    * the binary label (positive account balance) over the OTHER rows
    * of the segment: (Σy_grp − y_i)/(n_grp − 1). Plain mean encoding
    * trains on each row's own label (leakage that inflates every tree
    * model's validation score); LOO removes it with a closed form —
    * one 5-row aggregate broadcast back onto the scan, the exact shape
    * that survives any cardinality. Integer sums; per-row division is
    * the only float. */
  val m132LooEncoding: Q = (s, d) => {
    val rows = customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
        expr("CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END").cast("long").as("y"))
    val cells = rows.groupBy("seg")
      .agg(count(lit(1)).as("n_seg"), sum("y").as("sy"))
    rows.join(broadcast(cells), "seg")
      .select(col("c_custkey"), col("seg"), col("y"),
        r4(expr("CAST(sy - y AS DOUBLE) / (n_seg - 1)")).as("loo_enc"))
      .orderBy("c_custkey")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m131_smd_balance" -> m131SmdBalance,
    "m132_loo_encoding" -> m132LooEncoding)

  val oracleSql: Map[String, String] = Map(
    "m131_smd_balance" -> {
      val nib =
        "(instr('0123456789abcdef', substr(md5(concat(c_custkey, ':srm')), 1, 1)) - 1)"
      s"""WITH r AS (
        |  SELECT CASE WHEN $nib < 8 THEN 'A' WHEN $nib < 12 THEN 'B' ELSE 'C' END AS arm,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal,
        |    CAST(c_nationkey AS BIGINT) AS nlen
        |  FROM customer),
        |agg AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |    CAST(sum(CASE WHEN arm = 'A' THEN bal ELSE 0 END) AS BIGINT) AS sba,
        |    CAST(sum(CASE WHEN arm = 'B' THEN bal ELSE 0 END) AS BIGINT) AS sbb,
        |    CAST(sum(CASE WHEN arm = 'A' THEN bal * bal ELSE 0 END) AS BIGINT) AS qba,
        |    CAST(sum(CASE WHEN arm = 'B' THEN bal * bal ELSE 0 END) AS BIGINT) AS qbb,
        |    CAST(sum(CASE WHEN arm = 'A' THEN nlen ELSE 0 END) AS BIGINT) AS sla,
        |    CAST(sum(CASE WHEN arm = 'B' THEN nlen ELSE 0 END) AS BIGINT) AS slb,
        |    CAST(sum(CASE WHEN arm = 'A' THEN nlen * nlen ELSE 0 END) AS BIGINT) AS qla,
        |    CAST(sum(CASE WHEN arm = 'B' THEN nlen * nlen ELSE 0 END) AS BIGINT) AS qlb
        |  FROM r)
        |SELECT na, nb,
        |  round(${smdSql("sba", "qba", "na", "sbb", "qbb", "nb")}, 4) AS smd_acctbal,
        |  round(${smdSql("sla", "qla", "na", "slb", "qlb", "nb")}, 4) AS smd_nation
        |FROM agg""".stripMargin
    },
    "m132_loo_encoding" ->
      """WITH r AS (
        |  SELECT c_custkey, c_mktsegment AS seg,
        |    CAST(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS BIGINT) AS y
        |  FROM customer),
        |cells AS (
        |  SELECT seg, CAST(count(*) AS BIGINT) AS n_seg,
        |    CAST(sum(y) AS BIGINT) AS sy
        |  FROM r GROUP BY 1)
        |SELECT c_custkey, r.seg, y,
        |  round(CAST(sy - y AS DOUBLE) / (n_seg - 1), 4) AS loo_enc
        |FROM r JOIN cells ON cells.seg = r.seg
        |ORDER BY c_custkey""".stripMargin)
}
