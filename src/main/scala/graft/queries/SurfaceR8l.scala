package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-8 batch 12: cumulative gains table and SQL pipe syntax.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.11 (M evaluators) and §2.12 (X SQL surface).
  */
object SurfaceR8l extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M34: cumulative gains / lift table — score deciles ranked best
    * first, reporting what share of all positives the top-k bins
    * capture and the lift over random targeting. Completes the m32
    * (AUC) / m33 (calibration) evaluator family. Same md5-uniform
    * score and fixed-width bins as m33 (no sort over facts — one hash
    * agg, then a 10-row cumulative window); all ratios are single
    * divisions of exact integer sums. A uniform random score hovers
    * at lift ≈ 1, which is the fixture's expected read-out. */
  val m34GainsTable: Q = (s, d) => {
    val e = events(s, d).select(
      expr("""((instr('0123456789abcdef', substr(md5(event_id || 'cal'), 1, 1)) - 1) * 16 +
             | (instr('0123456789abcdef', substr(md5(event_id || 'cal'), 2, 1)) - 1))
             |""".stripMargin.replaceAll("\n", "")).as("s256"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val bins = e
      .withColumn("bin", least(expr("(s256 * 10) div 256"), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("npos"))
    // rank best-score-first; the window runs over 10 rows (bounded by
    // construction — constant-bucket partition keeps the tripwire quiet)
    val w = graft.Windows.bounded(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = bins.agg(sum("n").as("ntot"), sum("npos").as("ptot"))
    bins
      .withColumn("cum_n", sum("n").over(w))
      .withColumn("cum_pos", sum("npos").over(w))
      .crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("npos"),
        Orc.r4(col("cum_pos").cast("double") / col("ptot").cast("double"))
          .as("gain"),
        Orc.r4((col("cum_pos").cast("double") / col("ptot").cast("double")) /
          (col("cum_n").cast("double") / col("ntot").cast("double")))
          .as("lift"))
      .orderBy(col("bin").desc)
  }

  /** X15: Spark 4 SQL PIPE syntax (`|>`) — the operator-chain front
    * door; each stage is a table transform, so the query reads in
    * execution order instead of inside-out. Resolves to the same plan
    * as the nested-SQL equivalent (which is what the oracle runs). */
  val x15PipeSyntax: Q = (s, d) => {
    lineitem(s, d).createOrReplaceTempView("graft_r8l_li")
    s.sql(
      """FROM graft_r8l_li
        ||> WHERE l_quantity >= 10
        ||> EXTEND CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4 + 5e-1)
        |          AS BIGINT) AS qrev
        ||> AGGREGATE count(*) AS n_rows,
        |             CAST(sum(qrev) AS BIGINT) AS qrev_sum
        |   GROUP BY l_returnflag, l_linestatus
        ||> WHERE n_rows > 100
        ||> SELECT l_returnflag, l_linestatus, n_rows,
        |          floor(CAST(qrev_sum AS DOUBLE) / 1e4 * 1e4 + 5e-1) / 1e4 AS revenue
        ||> ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m34_gains_table" -> m34GainsTable,
    "x15_pipe_syntax" -> x15PipeSyntax)

  val oracleSql: Map[String, String] = Map(
    "m34_gains_table" ->
      """WITH e AS (
        |  SELECT ((instr('0123456789abcdef', substr(md5(event_id || 'cal'), 1, 1)) - 1) * 16 +
        |          (instr('0123456789abcdef', substr(md5(event_id || 'cal'), 2, 1)) - 1)) AS s256,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |b AS (
        |  SELECT least(CAST(s256 * 10 // 256 AS BIGINT), 9) AS bin,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS npos
        |  FROM e GROUP BY 1),
        |c AS (
        |  SELECT bin, n, npos,
        |    CAST(sum(n) OVER (ORDER BY bin DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
        |    CAST(sum(npos) OVER (ORDER BY bin DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
        |    CAST(sum(n) OVER () AS BIGINT) AS ntot,
        |    CAST(sum(npos) OVER () AS BIGINT) AS ptot
        |  FROM b)
        |SELECT bin, n, npos,
        |  round(CAST(cum_pos AS DOUBLE) / CAST(ptot AS DOUBLE), 4) AS gain,
        |  round((CAST(cum_pos AS DOUBLE) / CAST(ptot AS DOUBLE)) /
        |        (CAST(cum_n AS DOUBLE) / CAST(ntot AS DOUBLE)), 4) AS lift
        |FROM c ORDER BY bin DESC""".stripMargin,
    "x15_pipe_syntax" ->
      """WITH f AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4 + 5e-1) AS BIGINT)
        |      AS qrev
        |  FROM lineitem WHERE l_quantity >= 10),
        |g AS (
        |  SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(qrev) AS BIGINT) AS qrev_sum
        |  FROM f GROUP BY l_returnflag, l_linestatus)
        |SELECT l_returnflag, l_linestatus, n_rows,
        |  floor(CAST(qrev_sum AS DOUBLE) / 1e4 * 1e4 + 5e-1) / 1e4 AS revenue
        |FROM g WHERE n_rows > 100
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
