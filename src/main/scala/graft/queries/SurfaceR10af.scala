package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 32: two correlation/reliability closers —
  * Kendall's τ-b from the bounded contingency table (completing the
  * Pearson/Spearman/Kendall trio) and Cronbach's alpha (internal-
  * consistency reliability of a multi-item score).
  *
  * Float discipline per SurfaceR10l: everything is exact-integer
  * counting until one shared closed-form text.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.13 (statistics).
  */
object SurfaceR10af extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M105: Kendall's tau-b ----

  private val tauSql =
    "((CAST(cc AS DOUBLE) - dd) / sqrt((CAST(n0 AS DOUBLE) - tx) * (CAST(n0 AS DOUBLE) - ty)))"

  /** M105: KENDALL'S τ-b between quantity and price decile per return
    * flag — the third rank correlation next to Pearson (a7) and
    * Spearman (m67), the one robust to ties AND monotone
    * transformations. The trick that makes it scale: concordant/
    * discordant pairs are counted on the CONTINGENCY TABLE, not the
    * rows — the cell self-join is bounded by the value domain
    * (50 quantities × ~10 deciles), so the O(n²) pair space collapses
    * to a constant-size join at ANY corpus size, with exact integer
    * products (the n² term would outgrow BIGINT around 10¹² rows;
    * cast to DOUBLE at that tier, stated). Tie corrections from the
    * margins (τ-b's denominator). */
  val m105KendallTau: Q = (s, d) => {
    val cells = lineitem(s, d)
      .select(col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") / 10000).cast("long").as("y"))
      .groupBy("flag", "x", "y").agg(count(lit(1)).as("cnt"))
    val a = cells.select(col("flag"), col("x").as("xa"), col("y").as("ya"),
      col("cnt").as("na"))
    val b = cells.select(col("flag").as("flag_b"), col("x").as("xb"),
      col("y").as("yb"), col("cnt").as("nb"))
    val pairs = a.join(b, col("flag") === col("flag_b"))
    val cd = pairs
      .groupBy("flag")
      .agg(
        (sum(when(col("xa") < col("xb") && col("ya") < col("yb"),
          expr("na * nb")).otherwise(0L))).as("cc"),
        (sum(when(col("xa") < col("xb") && col("ya") > col("yb"),
          expr("na * nb")).otherwise(0L))).as("dd"))
    val margins = cells.groupBy("flag").agg(sum("cnt").as("n"))
      .join(cells.groupBy("flag", "x").agg(sum("cnt").as("tx_c"))
        .groupBy("flag").agg(sum(expr("tx_c * (tx_c - 1) / 2")).as("tx")),
        "flag")
      .join(cells.groupBy("flag", "y").agg(sum("cnt").as("ty_c"))
        .groupBy("flag").agg(sum(expr("ty_c * (ty_c - 1) / 2")).as("ty")),
        "flag")
      .withColumn("n0", expr("n * (n - 1) / 2"))
    cd.join(margins, "flag")
      .select(col("flag"), col("n"), col("cc"), col("dd"),
        r4(expr(tauSql)).as("tau_b"))
      .orderBy("flag")
  }

  // ---- M106: Cronbach's alpha ----

  private def varSql(s1: String, s2: String) =
    s"((CAST(n AS DOUBLE) * $s2 - CAST($s1 AS DOUBLE) * $s1) / (CAST(n AS DOUBLE) * (n - 1)))"
  private val alphaItems = Seq(1995, 1996, 1997, 1998, 1999, 2000)
  private val alphaSumVarSql = alphaItems.map(y =>
    varSql(s"s$y", s"q$y")).mkString("(", " + ", ")")
  private val alphaSql = {
    val k = alphaItems.length
    s"(($k.0 / ${k - 1}.0) * (1.0 - $alphaSumVarSql / ${varSql("st", "qt")}))"
  }

  /** M106: CRONBACH'S ALPHA — internal consistency of a 6-item
    * "annual spend" score (one item per year 1995–2000, per customer,
    * in exact whole dollars): α = k/(k−1)·(1 − Σσ²ᵢ/σ²ₜ). The
    * reliability number quoted for any multi-item measurement
    * (surveys, rubric scores, multi-judge evals). One customer-grain
    * aggregate produces the item scores; one global aggregate their
    * exact power sums; α is a single shared closed form. */
  val m106CronbachAlpha: Q = (s, d) => {
    val yearCols = alphaItems.map { y =>
      sum(when(year(col("o_orderdate")) === y,
        floor(col("o_totalprice")).cast("long")).otherwise(0L)).as(s"v$y")
    }
    val per = orders(s, d).groupBy("o_custkey")
      .agg(yearCols.head, yearCols.tail: _*)
      .withColumn("vt", alphaItems.map(y => col(s"v$y")).reduce(_ + _))
    val sums = alphaItems.flatMap { y =>
      Seq(sum(col(s"v$y")).as(s"s$y"),
        sum(expr(s"v$y * v$y")).as(s"q$y"))
    } ++ Seq(sum("vt").as("st"), sum(expr("vt * vt")).as("qt"),
      count(lit(1)).as("n"))
    per.agg(sums.head, sums.tail: _*)
      .select(col("n").as("n_customers"),
        lit(alphaItems.length).as("k_items"),
        r4(expr(alphaSumVarSql)).as("sum_item_var"),
        r4(expr(varSql("st", "qt"))).as("total_var"),
        r4(expr(alphaSql)).as("alpha"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m105_kendall_tau" -> m105KendallTau,
    "m106_cronbach_alpha" -> m106CronbachAlpha)

  val oracleSql: Map[String, String] = Map(
    "m105_kendall_tau" ->
      s"""WITH cells AS (
        |  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice / 10000) AS BIGINT) AS y,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1, 2, 3),
        |cd AS (
        |  SELECT a.flag,
        |    CAST(sum(CASE WHEN a.x < b.x AND a.y < b.y
        |      THEN a.cnt * b.cnt ELSE 0 END) AS BIGINT) AS cc,
        |    CAST(sum(CASE WHEN a.x < b.x AND a.y > b.y
        |      THEN a.cnt * b.cnt ELSE 0 END) AS BIGINT) AS dd
        |  FROM cells a JOIN cells b ON b.flag = a.flag
        |  GROUP BY a.flag),
        |nn AS (SELECT flag, CAST(sum(cnt) AS BIGINT) AS n FROM cells GROUP BY flag),
        |txs AS (
        |  SELECT flag, CAST(sum(tx_c * (tx_c - 1) / 2) AS BIGINT) AS tx FROM (
        |    SELECT flag, x, sum(cnt) AS tx_c FROM cells GROUP BY 1, 2)
        |  GROUP BY flag),
        |tys AS (
        |  SELECT flag, CAST(sum(ty_c * (ty_c - 1) / 2) AS BIGINT) AS ty FROM (
        |    SELECT flag, y, sum(cnt) AS ty_c FROM cells GROUP BY 1, 2)
        |  GROUP BY flag),
        |m AS (
        |  SELECT cd.flag, n, cc, dd, tx, ty,
        |    CAST(n * (n - 1) / 2 AS BIGINT) AS n0
        |  FROM cd JOIN nn USING (flag) JOIN txs USING (flag)
        |  JOIN tys USING (flag))
        |SELECT flag, n, cc, dd, round($tauSql, 4) AS tau_b
        |FROM m ORDER BY flag""".stripMargin,
    "m106_cronbach_alpha" -> {
      val itemSel = alphaItems.map(y =>
        s"CAST(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = $y " +
          s"THEN CAST(floor(o_totalprice) AS BIGINT) ELSE 0 END) AS BIGINT) AS v$y")
        .mkString(",\n        |    ")
      val sumSel = alphaItems.map(y =>
        s"CAST(sum(v$y) AS BIGINT) AS s$y, CAST(sum(v$y * v$y) AS BIGINT) AS q$y")
        .mkString(",\n        |    ")
      val vtExpr = alphaItems.map(y => s"v$y").mkString(" + ")
      s"""WITH per AS (
        |  SELECT o_custkey,
        |    $itemSel
        |  FROM orders GROUP BY o_custkey),
        |per2 AS (SELECT per.*, $vtExpr AS vt FROM per),
        |agg AS (
        |  SELECT
        |    $sumSel,
        |    CAST(sum(vt) AS BIGINT) AS st, CAST(sum(vt * vt) AS BIGINT) AS qt,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM per2)
        |SELECT n AS n_customers, ${alphaItems.length} AS k_items,
        |  round($alphaSumVarSql, 4) AS sum_item_var,
        |  round(${varSql("st", "qt")}, 4) AS total_var,
        |  round($alphaSql, 4) AS alpha
        |FROM agg""".stripMargin
    })
}
