package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-8 batch 5: series autocorrelation and Pareto (ABC) analysis.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2 (A aggregates, W windows) and §2.13 (time series,
  * product analytics).
  */
object SurfaceR8e extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** LT11: autocorrelation of each event_type's value series at lags
    * 1..5 — the seasonality probe run before fitting any forecaster.
    * Pearson r over (x_t, x_{t−k}) pairs from one lag window per lag.
    * Determinism: values are 1e-4-quantized to BIGINT, the five sums
    * (Σx, Σy, Σxy, Σx², Σy²) are EXACT integer aggregates, and only
    * then does the correlation formula run in doubles — both engines
    * see identical integers, so every derived double is bit-identical
    * (a float covariance would drift by summation order). The integer
    * sums also partial-aggregate safely across executors; per-type
    * partitions scale like every per-entity window. */
  val lt11Acf: Q = (s, d) => {
    val e = events(s, d)
      .select(col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("tu"),
        expr("CAST(floor(value * 1e4 + 5e-1) AS BIGINT)").as("q"))
    val w = Window.partitionBy("event_type").orderBy(col("tu"), col("event_id"))
    // all five lags from ONE window pass (guide §2.4: operations keyed
    // the same way share one exchange+sort): the old per-lag union
    // re-scanned events and re-sorted the per-type window five times.
    // posexplode unstacks the lag columns; rows are identical to the
    // five-branch union (same (event_type, lag, q, y) multiset).
    val withLags = e.select(
      col("event_type") +: col("q") +:
        (1 to 5).map(k => lag(col("q"), k).over(w).as(s"_y$k")): _*)
    val lagged = withLags
      .select(col("event_type"), col("q"),
        posexplode(array((1 to 5).map(k => col(s"_y$k")): _*)).as(Seq("p", "y")))
      .where(col("y").isNotNull)
      .withColumn("lag", (col("p") + 1).cast("long"))
    val sums = lagged.groupBy("event_type", "lag")
      .agg(count(lit(1)).as("n"),
        sum("q").as("sx"), sum("y").as("sy"),
        sum(col("q") * col("y")).as("sxy"),
        sum(col("q") * col("q")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val cov = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    sums
      .select(col("event_type"), col("lag"), col("n"),
        Orc.r4(cov / (sqrt(vx) * sqrt(vy))).as("acf"))
      .orderBy("event_type", "lag")
  }

  /** Q27: Pareto / ABC analysis — parts ranked by revenue, classified
    * by cumulative share (A ≤ 50%, B ≤ 80%, C rest), reported as class
    * rollups. The scalable order of operations: per-row revenue is
    * 1e-4-quantized and summed EXACTLY per part first (one hash agg —
    * facts never reach a window), then the cumulative sum runs through
    * [[graft.operators.PrefixSum]]'s range-partition scheme — descending
    * revenue is expressed as ascending (−rev, partkey), so NO
    * single-partition window exists anywhere in the plan even though
    * the part table grows with data (2 M parts at sf10, more at
    * 100 TB; only the numPartitions-row offset cumsum is ever on one
    * task). Integer revenue sums make cum/total bit-identical on both
    * engines; ties in revenue break by partkey. */
  val q27AbcPareto: Q = (s, d) => {
    val byPart = lineitem(s, d)
      .select(col("l_partkey"),
        expr("CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4 + 5e-1) AS BIGINT)")
          .as("qrev"))
      .groupBy("l_partkey").agg(sum("qrev").as("rev"))
    val share = col("cum").cast("double") / col("total").cast("double")
    // the grand total IS the last inclusive running total — deriving it
    // from PrefixSum's (checkpointed) output instead of a second
    // byPart aggregation saves a full lineitem scan + hash agg
    // (guide §1.2); integer sums make the two forms bit-identical
    val ranked = graft.operators.PrefixSum.withRunningTotal(
        byPart.withColumn("negrev", -col("rev")),
        sortCols = Seq("negrev", "l_partkey"), valueCol = "rev",
        outCol = "cum")
      .drop("negrev")
    val tot = ranked.agg(max("cum").as("total"))
    ranked
      .crossJoin(broadcast(tot))
      .withColumn("cls",
        when(share <= lit(0.5), "A").when(share <= lit(0.8), "B").otherwise("C"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_parts"),
        Orc.r4(sum(col("rev")).cast("double") / lit(1e4)).as("revenue"))
      .orderBy("cls")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt11_acf" -> lt11Acf,
    "q27_abc_pareto" -> q27AbcPareto)

  val oracleSql: Map[String, String] = Map(
    "lt11_acf" ->
      """WITH e AS (
        |  SELECT event_id, event_type, epoch_us(ts) AS tu,
        |    CAST(floor(value * 1e4 + 5e-1) AS BIGINT) AS q
        |  FROM events),
        |l AS (
        |  SELECT event_type, k.lag, q,
        |    lag(q, CAST(k.lag AS INT)) OVER (PARTITION BY event_type, k.lag
        |      ORDER BY tu, event_id) AS y
        |  FROM e CROSS JOIN (SELECT unnest([1, 2, 3, 4, 5]) AS lag) k),
        |s AS (
        |  SELECT event_type, CAST(lag AS BIGINT) AS lag,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(q) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(q * y) AS BIGINT) AS sxy,
        |    CAST(sum(q * q) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM l WHERE y IS NOT NULL GROUP BY event_type, lag)
        |SELECT event_type, lag, n,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) AS acf
        |FROM s ORDER BY event_type, lag""".stripMargin,
    "q27_abc_pareto" ->
      """WITH p AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4 + 5e-1)
        |                  AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY l_partkey),
        |c AS (
        |  SELECT l_partkey, rev,
        |    CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(rev) OVER () AS BIGINT) AS total
        |  FROM p),
        |k AS (
        |  SELECT rev,
        |    CASE WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 5e-1 THEN 'A'
        |         WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 8e-1 THEN 'B'
        |         ELSE 'C' END AS cls
        |  FROM c)
        |SELECT cls, CAST(count(*) AS BIGINT) AS n_parts,
        |  round(CAST(CAST(sum(rev) AS BIGINT) AS DOUBLE) / 1e4, 4) AS revenue
        |FROM k GROUP BY cls ORDER BY cls""".stripMargin)
}
