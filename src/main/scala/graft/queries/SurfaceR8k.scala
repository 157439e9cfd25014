package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 batch 11: domain-mixture balancing under a token budget.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.10 (curation / pipeline family).
  */
object SurfaceR8k {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** LP29: waterfilling allocation of a token budget across sources —
    * the domain-balancing step of corpus mixing (every domain keeps
    * everything below the waterline; over-represented domains are
    * capped at a common level so the total hits the budget exactly).
    * Budget = 50% of corpus tokens. The waterline is found in closed
    * form from the by-size prefix sums — sources sorted ascending, k*
    * = the last rank whose full take still fits with the remaining
    * sources at its size — then the integer level and a deterministic
    * ±1 remainder spread make Σ alloc = budget EXACTLY (all integer
    * arithmetic; the spec asserts exact closure and the cap/level
    * dichotomy). Every window here runs over the #domains relation,
    * which is small by construction; facts are touched once for the
    * token counts. */
  val lp29MixtureWaterfill: Q = (s, d) => {
    val src = documents(s, d)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n"))
    val tot = src.agg(sum("n").as("stot"), count(lit(1)).as("k"),
      (sum("n") / 2).cast("long").as("b"))
    val byN = Window.orderBy("n", "source")
    val o = src
      .withColumn("rk", row_number().over(byN).cast("long"))
      .withColumn("pre", sum("n").over(
        byN.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
    val kstar = o
      .agg(max(when(col("pre") + col("n") * (col("k") - col("rk")) <= col("b"),
        col("rk")).otherwise(0L)).as("kstar"))
    val withK = o.crossJoin(broadcast(kstar))
    val preK = withK.where(col("rk") === col("kstar"))
      .agg(coalesce(max("pre"), lit(0L)).as("prek"))
    val staged = withK.crossJoin(broadcast(preK))
      .withColumn("level",
        when(col("kstar") === col("k"), lit(null).cast("long"))
          .otherwise(((col("b") - coalesce(col("prek"), lit(0L))) /
            (col("k") - col("kstar"))).cast("long")))
      .withColumn("a0",
        when(col("level").isNull || col("rk") <= col("kstar"), col("n"))
          .otherwise(col("level")))
    val rem = staged.agg((max("b") - sum("a0")).as("r"))
    staged.crossJoin(broadcast(rem))
      .withColumn("bump",
        when(col("a0") < col("n") &&
          row_number().over(
            Window.partitionBy(col("a0") < col("n")).orderBy("rk"))
            .cast("long") <= col("r") && col("r") > 0L, 1L)
          .otherwise(0L))
      .select(col("source"), col("n"), (col("a0") + col("bump")).as("alloc"))
      .orderBy("source")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp29_mixture_waterfill" -> lp29MixtureWaterfill)

  val oracleSql: Map[String, String] = Map(
    "lp29_mixture_waterfill" ->
      """WITH src AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |        CAST(sum(n) // 2 AS BIGINT) AS b FROM src),
        |o AS (
        |  SELECT source, n,
        |    CAST(row_number() OVER (ORDER BY n, source) AS BIGINT) AS rk,
        |    CAST(sum(n) OVER (ORDER BY n, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pre
        |  FROM src),
        |lvl AS (
        |  SELECT max(CASE WHEN pre + n * (k - rk) <= b THEN rk ELSE 0 END) AS kstar
        |  FROM o CROSS JOIN tot),
        |wl AS (
        |  SELECT kstar,
        |    CASE WHEN kstar = (SELECT k FROM tot) THEN NULL
        |         ELSE ((SELECT b FROM tot)
        |               - coalesce((SELECT pre FROM o WHERE rk = kstar), 0))
        |              // ((SELECT k FROM tot) - kstar) END AS level
        |  FROM lvl),
        |alloc AS (
        |  SELECT o.source, o.n, o.rk,
        |    CASE WHEN wl.level IS NULL OR o.rk <= wl.kstar THEN o.n
        |         ELSE wl.level END AS a0
        |  FROM o CROSS JOIN wl),
        |rem AS (
        |  SELECT (SELECT b FROM tot) - CAST(sum(a0) AS BIGINT) AS r FROM alloc)
        |SELECT source, n,
        |  CAST(a0 + CASE WHEN a0 < n AND
        |      row_number() OVER (PARTITION BY (a0 < n) ORDER BY rk)
        |        <= (SELECT r FROM rem)
        |      AND (SELECT r FROM rem) > 0 THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM alloc ORDER BY source""".stripMargin)
}
