package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 80: stratified categorical inference — the
  * Mantel–Haenszel pooled odds ratio with the CMH test, and the
  * Cochran–Armitage trend test for a binary outcome over ORDERED
  * groups.
  *
  * Contrast with near-siblings: m163's Simpson audit DETECTS
  * stratum-vs-pooled sign reversal for regression slopes; MH is the
  * categorical REMEDY — the stratum-adjusted association estimate a
  * 2×2-per-stratum design should report instead of the pooled table.
  * m162's Jonckheere–Terpstra orders groups against a CONTINUOUS
  * response via pairwise rank dominance; Cochran–Armitage is its
  * binary-response counterpart (scored proportions, χ²(1) trend), not
  * derivable from it.
  *
  * Float discipline: all 2×2 cells and trend moments are exact BIGINT
  * counts; per-stratum ratio terms are fixed shared-formula doubles
  * accumulated by ORDERED cumsum over the 25 bounded strata
  * (order-pinned floats, the m164 idiom), never an unordered float sum.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.13 (statistical tests), siblings m162/m163.
  */
object SurfaceR10cb extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M165: MANTEL–HAENSZEL pooled odds ratio + CMH statistic.
    * Unit = order⋈customer; stratum = c_nationkey (25, bounded);
    * exposure = positive account balance; outcome = urgent/high
    * priority. Per stratum the 2×2 cells (a,b,c,d) are exact counts;
    * OR_MH = Σ(ad/n)/Σ(bc/n) and CMH z² = (Σa − ΣE[a])²/ΣVar(a) with
    * E[a] = (a+b)(a+c)/n, Var(a) = (a+b)(c+d)(a+c)(b+d)/(n²(n−1)).
    * The four nonnegative double terms ride one ordered cumsum over
    * nationkey, so their totals (= max of a monotone cumsum) are
    * bit-reproducible. */
  val m165MantelHaenszel: Q = (s, d) => {
    val cells = orders(s, d)
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nk"),
        when(col("c_acctbal") > 0, 1L).otherwise(0L).as("e"),
        when(substring(col("o_orderpriority"), 1, 1).isin("1", "2"), 1L)
          .otherwise(0L).as("y"))
      .groupBy("nk")
      .agg(
        sum(expr("e * y")).as("a"),
        sum(expr("e * (1 - y)")).as("b"),
        sum(expr("(1 - e) * y")).as("c"),
        sum(expr("(1 - e) * (1 - y)")).as("dd"))
      .withColumn("n", expr("a + b + c + dd"))
      .withColumn("ad_n", expr("CAST(a AS DOUBLE) * dd / n"))
      .withColumn("bc_n", expr("CAST(b AS DOUBLE) * c / n"))
      .withColumn("ea", expr("CAST(a + b AS DOUBLE) * (a + c) / n"))
      .withColumn("va", expr(
        "CAST(a + b AS DOUBLE) * (c + dd) * (a + c) * (b + dd)" +
          " / (CAST(n AS DOUBLE) * n * (n - 1))"))
    val wCum = Windows.bounded(col("nk")).rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    cells
      .withColumn("cad", sum("ad_n").over(wCum))
      .withColumn("cbc", sum("bc_n").over(wCum))
      .withColumn("cea", sum("ea").over(wCum))
      .withColumn("cva", sum("va").over(wCum))
      .agg(
        count(lit(1)).as("n_strata"),
        sum("a").as("sum_a"),
        max("cad").as("tad"), max("cbc").as("tbc"),
        max("cea").as("tea"), max("cva").as("tva"))
      .select(col("n_strata"), col("sum_a"),
        r4(expr("tad / tbc")).as("or_mh"),
        r4(expr("(sum_a - tea) * (sum_a - tea) / tva")).as("cmh_chi2"))
  }

  /** M166: COCHRAN–ARMITAGE trend — does the fulfilled-rate trend
    * monotonically across the five scored priority classes? The
    * N-scaled statistic Tn = Σ gᵢ(N·rᵢ − nᵢ·R) and the moments S1/S2
    * are pure BIGINT; the χ²(1) value z² = Tn²·N / (R(N−R)(N·S2−S1²))
    * is one fixed double formula over those exact integers. Totals
    * arrive as a 1-row broadcast (the scalar-join idiom), and the
    * 5-group integer sum needs no ordering pin. */
  val m166CochranArmitage: Q = (s, d) => {
    val grp = orders(s, d)
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("g"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      .groupBy("g")
      .agg(count(lit(1)).as("ni"), sum("y").as("ri"))
    val tot = grp.agg(sum("ni").as("nn"), sum("ri").as("rr"))
    grp.crossJoin(broadcast(tot))
      .agg(
        max("nn").as("n_total"), max("rr").as("successes"),
        sum(expr("g * (nn * ri - ni * rr)")).as("t_num"),
        sum(expr("g * ni")).as("s1"),
        sum(expr("g * g * ni")).as("s2"))
      .select(col("n_total"), col("successes"), col("t_num"),
        r4(expr("CAST(t_num AS DOUBLE) * t_num * n_total" +
          " / (CAST(successes AS DOUBLE) * (n_total - successes)" +
          " * (CAST(n_total AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1))"))
          .as("ca_chi2"),
        (when(col("t_num") > 0, 1L).when(col("t_num") < 0, -1L)
          .otherwise(0L)).as("trend_sign"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m165_mantel_haenszel" -> m165MantelHaenszel,
    "m166_cochran_armitage" -> m166CochranArmitage)

  val oracleSql: Map[String, String] = Map(
    "m165_mantel_haenszel" ->
      """WITH cells AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nk,
        |    CAST(sum(e * y) AS BIGINT) AS a,
        |    CAST(sum(e * (1 - y)) AS BIGINT) AS b,
        |    CAST(sum((1 - e) * y) AS BIGINT) AS c,
        |    CAST(sum((1 - e) * (1 - y)) AS BIGINT) AS dd
        |  FROM (
        |    SELECT c_nationkey,
        |      CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS e,
        |      CASE WHEN substring(o_orderpriority, 1, 1) IN ('1', '2')
        |        THEN 1 ELSE 0 END AS y
        |    FROM orders JOIN customer ON o_custkey = c_custkey) u
        |  GROUP BY 1),
        |terms AS (
        |  SELECT nk, a,
        |    CAST(a AS DOUBLE) * dd / n AS ad_n,
        |    CAST(b AS DOUBLE) * c / n AS bc_n,
        |    CAST(a + b AS DOUBLE) * (a + c) / n AS ea,
        |    CAST(a + b AS DOUBLE) * (c + dd) * (a + c) * (b + dd)
        |      / (CAST(n AS DOUBLE) * n * (n - 1)) AS va
        |  FROM (SELECT *, a + b + c + dd AS n FROM cells) t),
        |cum AS (
        |  SELECT a,
        |    sum(ad_n) OVER (ORDER BY nk ROWS UNBOUNDED PRECEDING) AS cad,
        |    sum(bc_n) OVER (ORDER BY nk ROWS UNBOUNDED PRECEDING) AS cbc,
        |    sum(ea) OVER (ORDER BY nk ROWS UNBOUNDED PRECEDING) AS cea,
        |    sum(va) OVER (ORDER BY nk ROWS UNBOUNDED PRECEDING) AS cva
        |  FROM terms)
        |SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |  CAST(sum(a) AS BIGINT) AS sum_a,
        |  round(max(cad) / max(cbc), 4) AS or_mh,
        |  round((CAST(sum(a) AS BIGINT) - max(cea))
        |    * (CAST(sum(a) AS BIGINT) - max(cea)) / max(cva), 4) AS cmh_chi2
        |FROM cum""".stripMargin,
    "m166_cochran_armitage" ->
      """WITH grp AS (
        |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
        |    CAST(count(*) AS BIGINT) AS ni,
        |    CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ri
        |  FROM orders GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(ni) AS BIGINT) AS nn,
        |    CAST(sum(ri) AS BIGINT) AS rr FROM grp)
        |SELECT max(nn) AS n_total, max(rr) AS successes,
        |  CAST(sum(g * (nn * ri - ni * rr)) AS BIGINT) AS t_num,
        |  round(CAST(CAST(sum(g * (nn * ri - ni * rr)) AS BIGINT) AS DOUBLE)
        |    * CAST(sum(g * (nn * ri - ni * rr)) AS BIGINT) * max(nn)
        |    / (CAST(max(rr) AS DOUBLE) * (max(nn) - max(rr))
        |    * (CAST(max(nn) AS DOUBLE) * CAST(sum(g * g * ni) AS BIGINT)
        |      - CAST(CAST(sum(g * ni) AS BIGINT) AS DOUBLE)
        |        * CAST(sum(g * ni) AS BIGINT))), 4) AS ca_chi2,
        |  CAST(CASE WHEN sum(g * (nn * ri - ni * rr)) > 0 THEN 1
        |    WHEN sum(g * (nn * ri - ni * rr)) < 0 THEN -1
        |    ELSE 0 END AS BIGINT) AS trend_sign
        |FROM grp CROSS JOIN tot""".stripMargin)
}
