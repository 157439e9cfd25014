package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.{GlobalRowId, PrefixSum}

/** Round-8 batch 9: ROC-AUC, weighted median, and epoch shuffling.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.11 (M evaluators), §2 A-family, §2.10 (pipeline
  * utilities).
  */
object SurfaceR8i extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M32: ROC-AUC of `value` as a score for `event_type = 'purchase'`,
    * by the Mann–Whitney rank-sum identity with proper average-rank tie
    * handling — and WITHOUT ranking the fact table: ranks aggregate by
    * DISTINCT score first (n_v, pos_v per value), a window over the
    * distinct-value relation (≪ facts) yields each group's preceding
    * cumulative count, and Σ_pos avgrank derives from those integers.
    * 2·Σpos(avgrank) = Σ_v pos_v · (2·cum_prev + n_v + 1) stays integer
    * to the end; AUC = (that − npos(npos+1)) / (2·npos·nneg) is one
    * double division — bit-identical on both engines. For continuous
    * scores the distinct-value relation is as big as the facts, so the
    * cumulative count comes from [[PrefixSum]]'s range-partition
    * offsets, not a single-partition window. The m8 evaluator pair
    * (accuracy/RMSE) gets its ranking metric. */
  val m32RocAuc: Q = (s, d) => {
    val e = events(s, d).select(col("value"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val byV = e.groupBy("value")
      .agg(count(lit(1)).as("nv"), sum("y").as("posv"))
    val terms = PrefixSum
      .withRunningTotal(byV, Seq("value"), "nv", numPartitions = 16,
        outCol = "cumincl")
      .withColumn("cumprev", col("cumincl") - col("nv"))
      .select(
        (col("posv") * (lit(2L) * col("cumprev") + col("nv") + 1L)).as("t"),
        col("posv"), col("nv"))
    terms.agg(
        sum("t").as("s2"), sum("posv").as("npos"),
        (sum("nv") - sum("posv")).as("nneg"))
      .select(col("npos"), col("nneg"),
        Orc.r4((col("s2") - col("npos") * (col("npos") + 1L)).cast("double") /
          (lit(2.0) * col("npos").cast("double") * col("nneg").cast("double")))
          .as("auc"))
  }

  /** A31: weighted median — l_extendedprice weighted by l_quantity per
    * returnflag, the aggregate percentile_cont cannot express. Same
    * scalable shape as m32: weights aggregate per DISTINCT price first
    * (quantity floor-quantized to exact integers), one cumulative
    * window over the distinct-price relation, and the median is the
    * smallest price whose doubled cumulative weight reaches the total.
    * Integer comparisons throughout — no float boundary to disagree
    * on. */
  val a31WeightedMedian: Q = (s, d) => {
    val li = lineitem(s, d).select(col("l_returnflag").as("flag"),
      col("l_extendedprice").as("p"),
      expr("CAST(floor(l_quantity + 5e-1) AS BIGINT)").as("qw"))
    val byP = li.groupBy("flag", "p").agg(sum("qw").as("w"))
    val win = Window.partitionBy("flag").orderBy("p")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byP.groupBy("flag").agg(sum("w").as("wtot"))
    byP
      .withColumn("cum", sum("w").over(win))
      .join(tot, "flag")
      .where(lit(2L) * col("cum") >= col("wtot"))
      .groupBy("flag")
      .agg(min("p").as("weighted_median"), min("wtot").as("total_weight"))
      .orderBy("flag")
  }

  /** LP28: deterministic epoch shuffling — a fresh, reproducible
    * permutation of the corpus per training epoch from ordinals over
    * md5(doc_id ⊕ epoch), computed with [[GlobalRowId]]'s
    * range-partition offsets (never a corpus-wide single-partition
    * window; the hash key is unique w.h.p. and uniformly distributed,
    * so range partitions balance by construction). Epochs 1 and 2 are
    * emitted for a mod-25 sample of docs; the two orderings are
    * uncorrelated, which the spec checks via rank displacement. */
  val lp28EpochShuffle: Q = (s, d) => {
    val perEpoch = (1 to 2).map { ep =>
      val keyed = documents(s, d).select(col("doc_id"))
        .withColumn("hkey", md5(concat(col("doc_id").cast("string"),
          lit(s"#ep$ep"))))
      GlobalRowId.withRowIdCols(keyed, Seq("hkey"), numPartitions = 8,
          outCol = "ord")
        .select(lit(ep.toLong).as("epoch"), col("doc_id"), col("ord"))
    }
    perEpoch.reduce(_ unionAll _)
      .where(col("doc_id") % 25 === 0)
      .orderBy("epoch", "ord")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m32_roc_auc" -> m32RocAuc,
    "a31_weighted_median" -> a31WeightedMedian,
    "lp28_epoch_shuffle" -> lp28EpochShuffle)

  val oracleSql: Map[String, String] = Map(
    "m32_roc_auc" ->
      """WITH e AS (
        |  SELECT value,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |v AS (
        |  SELECT value, CAST(count(*) AS BIGINT) AS nv,
        |    CAST(sum(y) AS BIGINT) AS posv
        |  FROM e GROUP BY value),
        |c AS (
        |  SELECT nv, posv,
        |    CAST(coalesce(sum(nv) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cumprev
        |  FROM v),
        |t AS (
        |  SELECT CAST(sum(posv * (2 * cumprev + nv + 1)) AS BIGINT) AS s2,
        |    CAST(sum(posv) AS BIGINT) AS npos,
        |    CAST(sum(nv) - sum(posv) AS BIGINT) AS nneg
        |  FROM c)
        |SELECT npos, nneg,
        |  round(CAST(s2 - npos * (npos + 1) AS DOUBLE) /
        |    (2e0 * CAST(npos AS DOUBLE) * CAST(nneg AS DOUBLE)), 4) AS auc
        |FROM t""".stripMargin,
    "a31_weighted_median" ->
      """WITH li AS (
        |  SELECT l_returnflag AS flag, l_extendedprice AS p,
        |    CAST(floor(l_quantity + 5e-1) AS BIGINT) AS qw
        |  FROM lineitem),
        |bp AS (
        |  SELECT flag, p, CAST(sum(qw) AS BIGINT) AS w
        |  FROM li GROUP BY flag, p),
        |cw AS (
        |  SELECT flag, p,
        |    CAST(sum(w) OVER (PARTITION BY flag ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS wtot
        |  FROM bp)
        |SELECT flag, min(p) AS weighted_median, min(wtot) AS total_weight
        |FROM cw WHERE 2 * cum >= wtot
        |GROUP BY flag ORDER BY flag""".stripMargin,
    "lp28_epoch_shuffle" ->
      """WITH eps AS (SELECT unnest([1, 2]) AS epoch),
        |keyed AS (
        |  SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
        |    md5(doc_id || '#ep' || epoch) AS hkey
        |  FROM documents CROSS JOIN eps),
        |r AS (
        |  SELECT epoch, doc_id,
        |    row_number() OVER (PARTITION BY epoch ORDER BY hkey) - 1 AS ord
        |  FROM keyed)
        |SELECT epoch, doc_id, CAST(ord AS BIGINT) AS ord
        |FROM r WHERE doc_id % 25 = 0 ORDER BY epoch, ord""".stripMargin)
}
