package graft.queries

import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Orc, Tables}

/** Round-10 surface batch 3: remaining statistics/estimator breadth —
  * variance-threshold feature selection and Spearman rank correlation
  * (both with exact SQL oracles), the Poisson GLM pinned by its
  * canonical-link sum-preservation law, AFT survival regression, the
  * factorization-machine classifier — plus the SCD2 dimension build
  * (the warehouse-side operator a training-data pipeline uses for
  * point-in-time-correct joins).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.11 (ML surface), §2.5 (windows), §2.13.
  */
object SurfaceR10c extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M66: VarianceThresholdSelector over the first 8 embedding dims —
    * keeps dims with sample variance > 0.0155 (a threshold strictly
    * between the observed per-dim variances, so the selection is stable
    * under float noise). The fit is one Summarizer pass; the oracle
    * recomputes each dim's `var_samp` and applies the same cut. */
  val m66VarianceThreshold: Q = (s, d) => {
    val base = embeddings(s, d)
      .select(array_to_vector(slice(col("embedding"), 1, 8)).as("f"))
    val sel = new org.apache.spark.ml.feature.VarianceThresholdSelector()
      .setVarianceThreshold(0.0155)
      .setFeaturesCol("f").setOutputCol("kept")
    val dims = sel.fit(base).selectedFeatures
    s.createDataFrame(
      s.sparkContext.parallelize(dims.toSeq.map(i => org.apache.spark.sql.Row(i.toLong)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("dim",
          org.apache.spark.sql.types.LongType, nullable = false))))
      .orderBy("dim")
  }

  /** M67: SPEARMAN rank correlation of embedding dims (1,2), (1,3),
    * (2,3) via `ml.stat.Correlation` — average ranks then Pearson, the
    * same definition the SQL oracle spells out with rank windows
    * (`rank() + (ties-1)/2`). One distributed rank pass per column plus
    * a Gram-matrix aggregate. */
  val m67SpearmanCorr: Q = (s, d) => {
    val df = embeddings(s, d)
      .select(array_to_vector(slice(col("embedding"), 1, 3)).as("v"))
    val m = org.apache.spark.ml.stat.Correlation.corr(df, "v", "spearman")
      .head.getAs[org.apache.spark.ml.linalg.Matrix](0)
    val rows = Seq(("d1_d2", m(0, 1)), ("d1_d3", m(0, 2)), ("d2_d3", m(1, 2)))
    import s.implicits._
    rows.toDF("pair", "rho").select(col("pair"), r4(col("rho")).as("rho4"))
      .orderBy("pair")
  }

  /** M68 (rows-only): GLR POISSON/LOG — counts regression: number of
    * orders per customer ~ account balance. No closed form, but the
    * canonical log link with an intercept forces sum(fitted) =
    * sum(observed) at the IRLS optimum — SurfaceR10cSpec asserts that
    * exactly-at-convergence law plus coefficient finiteness. */
  val m68GlrPoisson: Q = (s, d) => {
    val counts = orders(s, d).groupBy("o_custkey")
      .agg(count(lit(1)).cast("double").as("y"))
    val base = customer(s, d)
      .join(counts, col("c_custkey") === col("o_custkey"))
      .select(col("y"), (col("c_acctbal") / 1000.0).as("x"))
    val va = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("x")).setOutputCol("features")
    val glr = new org.apache.spark.ml.regression.GeneralizedLinearRegression()
      .setFamily("poisson").setLink("log").setRegParam(0.0).setMaxIter(50)
      .setFeaturesCol("features").setLabelCol("y")
    val m = glr.fit(va.transform(base))
    s.range(1).select(
      r4(lit(m.coefficients(0))).as("beta"),
      r4(lit(m.intercept)).as("intercept"))
  }

  /** M69 (rows-only): AFTSurvivalRegression — log-linear survival model
    * with right censoring (orderstatus F = event observed, else
    * censored); label is a positive price scale, feature the order
    * month. Quantile-monotonicity law in the spec. */
  val m69AftSurvival: Q = (s, d) => {
    val base = orders(s, d).select(
      (col("o_totalprice") / 1000.0).as("label"),
      when(col("o_orderstatus") === "F", 1.0).otherwise(0.0).as("censor"),
      month(col("o_orderdate")).cast("double").as("m"))
    val va = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("m")).setOutputCol("features")
    val aft = new org.apache.spark.ml.regression.AFTSurvivalRegression()
      .setFeaturesCol("features").setLabelCol("label").setCensorCol("censor")
    val m = aft.fit(va.transform(base))
    s.range(1).select(
      r4(lit(m.coefficients(0))).as("beta"),
      r4(lit(m.intercept)).as("intercept"),
      r4(lit(m.scale)).as("scale"))
  }

  /** M70 (rows-only): FMClassifier — 2-way factorization machine on the
    * embeddings with the parity label (the interaction-aware sibling of
    * m61's linear SVC). Seeded; blob-separability law in the spec;
    * output is the prediction histogram. */
  val m70FmClassifier: Q = (s, d) => {
    val feats = embeddings(s, d).select(
      (col("label") % 2).cast("double").as("label"),
      array_to_vector(col("embedding")).as("features"))
    val fm = new org.apache.spark.ml.classification.FMClassifier()
      .setFactorSize(4).setMaxIter(30).setSeed(42L).setStepSize(0.1)
      .setFeaturesCol("features").setLabelCol("label")
    // copy() drops trainingSummary (see m61)
    fm.fit(feats).copy(org.apache.spark.ml.param.ParamMap.empty)
      .transform(feats)
      .groupBy(col("prediction").cast("int").as("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("pred")
  }

  /** Q33: SCD2 DIMENSION BUILD — collapse each user's event-type change
    * log into type-2 dimension rows: effective_from = change timestamp,
    * effective_to = next change (NULL while current). The point-in-time
    * dimension a training pipeline joins features against. Two per-user
    * windows (lag to detect changes, lead to close intervals) — fully
    * partitioned by user_id, no global window. */
  val q33Scd2Build: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val changes = events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    val w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes
      .withColumn("eff_to", lead("ts", 1).over(w2))
      .select(
        col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("eff_from"),
        unix_micros(col("eff_to")).as("eff_to"),
        when(col("eff_to").isNull, 1L).otherwise(0L).as("is_current"))
      .orderBy("user_id", "eff_from", "event_type")
  }

  /** LM2: MULTIMODAL FRAME SAMPLING — the video-shaped pipeline stage:
    * treat each document's payload as a sequence of fixed-size 64-byte
    * frames, keep every 4th (temporal sampling), fingerprint the frame
    * and a 16-byte "crop" (spatial subselect) with md5. Pure Catalyst
    * (sequence + explode + substring + md5 — all codegen'd): the frame
    * index math is the real plumbing a video pipeline needs; actual
    * pixel decode stays behind the stubbed mapPartitions boundary that
    * lm/l11b cover (SURVEY §2.10 — codec libs absent in this sandbox).
    * Fixture payloads are ASCII text, so char-based substring ≡ byte
    * frames on both engines. Narrow explode, no shuffle. */
  val lm2FrameSample: Q = (s, d) => {
    documents(s, d)
      .select(col("doc_id"), col("text"),
        floor(length(col("text")) / 64).cast("long").as("nf"))
      .where(col("nf") >= 1)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), col("nf") - 1)).as("i"))
      .where(col("i") % 4 === 0)
      .select(col("doc_id"), col("i").as("frame_idx"),
        md5(expr("substring(text, cast(i*64+1 as int), 64)")).as("frame_md5"),
        md5(expr("substring(text, cast(i*64+1 as int), 16)")).as("crop_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m66_variance_threshold" -> m66VarianceThreshold,
    "m67_spearman_corr" -> m67SpearmanCorr,
    "m68_glr_poisson" -> m68GlrPoisson,
    "m69_aft_survival" -> m69AftSurvival,
    "m70_fm_classifier" -> m70FmClassifier,
    "q33_scd2_build" -> q33Scd2Build,
    "lm2_frame_sample" -> lm2FrameSample)

  val oracleSql: Map[String, String] = Map(
    "m66_variance_threshold" -> (0 until 8).map { i =>
      s"""SELECT ${i}::BIGINT AS dim, var_samp(CAST(embedding[${i + 1}] AS DOUBLE)) AS v
         |FROM embeddings""".stripMargin
    }.mkString("WITH vs AS (\n", "\nUNION ALL\n", s""")
      |SELECT dim FROM vs WHERE v > 0.0155 ORDER BY dim""".stripMargin),
    "m67_spearman_corr" ->
      """WITH r AS (
        |  SELECT
        |    rank() OVER (ORDER BY CAST(embedding[1] AS DOUBLE))
        |      + (count(*) OVER (PARTITION BY CAST(embedding[1] AS DOUBLE)) - 1) / 2.0 AS r1,
        |    rank() OVER (ORDER BY CAST(embedding[2] AS DOUBLE))
        |      + (count(*) OVER (PARTITION BY CAST(embedding[2] AS DOUBLE)) - 1) / 2.0 AS r2,
        |    rank() OVER (ORDER BY CAST(embedding[3] AS DOUBLE))
        |      + (count(*) OVER (PARTITION BY CAST(embedding[3] AS DOUBLE)) - 1) / 2.0 AS r3
        |  FROM embeddings)
        |SELECT pair, round(rho, 4) AS rho4 FROM (
        |  SELECT 'd1_d2' AS pair, corr(r1, r2) AS rho FROM r
        |  UNION ALL SELECT 'd1_d3', corr(r1, r3) FROM r
        |  UNION ALL SELECT 'd2_d3', corr(r2, r3) FROM r)
        |ORDER BY pair""".stripMargin,
    "lm2_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    CAST(floor(len(text) / 64) AS BIGINT) AS nf
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, text, unnest(range(nf)) AS i
        |  FROM f WHERE nf >= 1)
        |SELECT doc_id, i AS frame_idx,
        |  md5(substring(text, CAST(i*64+1 AS INT), 64)) AS frame_md5,
        |  md5(substring(text, CAST(i*64+1 AS INT), 16)) AS crop_md5
        |FROM e WHERE i % 4 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q33_scd2_build" ->
      """WITH c AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |ch AS (
        |  SELECT user_id, event_id, ts, event_type FROM c
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type,
        |  epoch_us(ts) AS eff_from,
        |  epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS eff_to,
        |  CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |       THEN 1::BIGINT ELSE 0::BIGINT END AS is_current
        |FROM ch ORDER BY user_id, eff_from, event_type""".stripMargin)
}
