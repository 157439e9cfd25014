package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.GlobalRowId

/** Round-10 surface batch 114: exact stratified k-fold assignment and
  * the Matthews correlation coefficient.
  *
  * Contrast with near-siblings: lp2 DRAWS one stratified sample
  * (sampleBy, per-stratum fractions in expectation), lp_hash_split /
  * lp10 assign md5 memberships whose stratum balance is only
  * multinomial-approximate, and m14's CrossValidator folds are
  * engine-random; lp74 partitions EVERY row into k folds with EXACT
  * per-stratum balance (fold counts within a stratum differ by at
  * most 1) — the assignment a class-imbalanced evaluation needs, and
  * it is scale-correct: the per-stratum ordinal comes from one
  * GlobalRowId range exchange over (stratum, md5 key) plus broadcast
  * stratum offsets, never a per-stratum window over facts. m192 vs
  * the m8 family: accuracy/P/R/F1 (m8, m126) degrade silently under
  * class imbalance and κ (m76) measures agreement, not prediction
  * quality; MCC is the single balanced summary of the 2×2 table that
  * stays near 0 for any trivial classifier regardless of skew.
  *
  * Float discipline: fold assignment is pure integer arithmetic on
  * exact ordinals; MCC's four cells are exact counts and the closing
  * ratio runs the products in DECIMAL(38,0)/HUGEINT before one
  * division (the a−b·c contraction trap never arises on integers).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.8 (splits) and §2.13 (evaluation); siblings
  * lp2/lp_hash_split/lp10, m8/m76/m126/m98.
  */
object SurfaceR10dj extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val K = 5

  /** LP74: STRATIFIED K-FOLD — order each language stratum by an md5
    * key (deterministic, retry-stable), take the per-stratum ordinal
    * via GlobalRowId over (lang, key) minus the broadcast stratum
    * offset, fold = ordinal mod K. Emits per (lang, fold): count and
    * the stratum's max−min fold-count spread (always ≤ 1 — the
    * exactness readout lp_hash_split cannot offer).
    *
    * Scale shape: one GlobalRowId range exchange over the corpus,
    * a bounded (#langs) aggregate broadcast back, and a hash agg —
    * no per-stratum window over facts anywhere.
    */
  val lp74StratifiedKfold: Q = (s, d) => {
    val keyed = documents(s, d)
      .select(col("doc_id"), col("lang"),
        expr("md5(text || 'kf')").as("key"))
    val ranked = GlobalRowId.withRowIdCols(keyed, Seq("lang", "key", "doc_id"),
      numPartitions = 32, outCol = "rid")
    val offsets = ranked.groupBy("lang").agg(min("rid").as("off"),
      count(lit(1)).as("n_lang"))
    val folded = ranked.join(broadcast(offsets), "lang")
      .withColumn("fold", expr(s"(rid - off) % $K"))
    val cells = folded.groupBy("lang", "fold")
      .agg(count(lit(1)).as("n"))
    val spread = cells.groupBy("lang")
      .agg((max("n") - min("n")).as("fold_spread"))
    cells.join(broadcast(spread), "lang")
      .select(col("lang"), col("fold"), col("n"), col("fold_spread"))
      .orderBy("lang", "fold")
  }

  /** MCC closing text: products in 128-bit, one division. */
  private val mccSql =
    "(CAST(CAST(tp AS DECIMAL(38,0)) * tn - CAST(fp AS DECIMAL(38,0)) * fn " +
      "AS DOUBLE) / sqrt(CAST(CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn) * " +
      "(tn + fp) * (tn + fn) AS DOUBLE)))"

  /** M192: MATTHEWS CORRELATION — truth = (lang = 'en'), prediction =
    * the trivial length rule (n_chars above the global doubled-median
    * cut). One row: the 2×2 cells, accuracy, and MCC — the readout
    * pair that shows accuracy flattering an imbalanced rule while MCC
    * stays honest.
    *
    * Scale shape: one scalar median broadcast, one hash agg over the
    * scan for all four cells.
    */
  val m192Mcc: Q = (s, d) => {
    val med = documents(s, d)
      .agg(expr("CAST(percentile(2 * n_chars, 0.5) AS BIGINT)").as("med2"))
    documents(s, d).crossJoin(broadcast(med))
      .select(
        (col("lang") === "en").as("t"),
        (col("n_chars") * 2 > col("med2")).as("p"))
      .agg(
        sum(when(col("t") && col("p"), 1L).otherwise(0L)).as("tp"),
        sum(when(!col("t") && !col("p"), 1L).otherwise(0L)).as("tn"),
        sum(when(!col("t") && col("p"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("t") && !col("p"), 1L).otherwise(0L)).as("fn"))
      .select(col("tp"), col("tn"), col("fp"), col("fn"),
        r4(expr("CAST(tp + tn AS DOUBLE) / (tp + tn + fp + fn)"))
          .as("accuracy"),
        r4(expr(mccSql)).as("mcc"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp74_stratified_kfold" -> lp74StratifiedKfold,
    "m192_mcc" -> m192Mcc)

  val oracleSql: Map[String, String] = Map(
    "lp74_stratified_kfold" ->
      s"""WITH keyed AS (
        |  SELECT doc_id, lang, md5(text || 'kf') AS key FROM documents),
        |ranked AS (
        |  SELECT lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY key, doc_id) - 1
        |      AS sr
        |  FROM keyed),
        |cells AS MATERIALIZED (
        |  SELECT lang, CAST(sr % $K AS BIGINT) AS fold,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM ranked GROUP BY 1, 2),
        |spread AS (
        |  SELECT lang, CAST(max(n) - min(n) AS BIGINT) AS fold_spread
        |  FROM cells GROUP BY 1)
        |SELECT c.lang, c.fold, c.n, s.fold_spread
        |FROM cells c JOIN spread s USING (lang)
        |ORDER BY c.lang, c.fold""".stripMargin,
    "m192_mcc" ->
      s"""WITH med AS (
        |  SELECT CAST(quantile_cont(2 * n_chars, 0.5) AS BIGINT) AS med2
        |  FROM documents),
        |cells AS (
        |  SELECT
        |    CAST(sum(CASE WHEN lang = 'en' AND n_chars * 2 > med2
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN lang <> 'en' AND n_chars * 2 <= med2
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |    CAST(sum(CASE WHEN lang <> 'en' AND n_chars * 2 > med2
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN lang = 'en' AND n_chars * 2 <= med2
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |  FROM documents CROSS JOIN med)
        |SELECT tp, tn, fp, fn,
        |  round(CAST(tp + tn AS DOUBLE) / (tp + tn + fp + fn), 4)
        |    AS accuracy,
        |  round(${mccSql.replace("DECIMAL(38,0)", "HUGEINT")}, 4) AS mcc
        |FROM cells""".stripMargin)
}
