package graft.queries

import org.apache.spark.ml.feature.{Bucketizer, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.ml.Pipelines

/** MLlib pipeline operators as queries (SURVEY.md §2.11). Deterministic
  * feature math (indexing, scaling, bucketing, metric formulas) carries
  * DuckDB oracles; model training entries are rows-only and get metric
  * bounds in MlSpec.
  */
object MlQueries extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M1: StringIndexer (frequencyDesc, ties by value) — mapping table. */
  val m1StringIndexer: Q = (s, d) => {
    val idx = new StringIndexer()
      .setInputCol("c_mktsegment").setOutputCol("seg_idx")
      .setStringOrderType("frequencyDesc")
    val model = idx.fit(customer(s, d))
    model.transform(customer(s, d))
      .select(col("c_mktsegment"), col("seg_idx").cast("int").as("seg_idx"))
      .distinct()
      .orderBy("seg_idx")
  }

  /** M2: StandardScaler (withMean, withStd) on a 1-dim vector — the
    * column form (x - μ) / σ_samp is the oracle. */
  val m2StandardScale: Q = (s, d) => {
    val df = customer(s, d).select(
      col("c_custkey"),
      org.apache.spark.ml.functions.array_to_vector(array(col("c_acctbal"))).as("v"))
    val scaler = new StandardScaler().setInputCol("v").setOutputCol("scaled")
      .setWithMean(true).setWithStd(true)
    scaler.fit(df).transform(df)
      .select(col("c_custkey"),
        r4(element_at(vector_to_array(col("scaled")), 1)).as("bal_z"))
      .orderBy("c_custkey")
  }

  /** M3: Bucketizer with fixed splits (CASE WHEN oracle). */
  val m3Bucketizer: Q = (s, d) => {
    val buck = new Bucketizer()
      .setInputCol("c_acctbal").setOutputCol("bucket")
      .setSplits(Array(Double.NegativeInfinity, 0.0, 2500.0, 5000.0, 7500.0,
        Double.PositiveInfinity))
    buck.transform(customer(s, d))
      .select(col("c_custkey"), col("bucket").cast("int").as("bucket"))
      .orderBy("c_custkey")
  }

  /** M8: evaluator math over a deterministic predictions table —
    * accuracy (MulticlassClassificationEvaluator) and RMSE
    * (RegressionEvaluator) must equal their SQL formulas. */
  val m8EvalMetrics: Q = (s, d) => {
    val preds = embeddings(s, d).select(
      col("vec_id"),
      col("label").cast("double").as("label"),
      ((col("label") + when(col("vec_id") % 3 === 0, 1).otherwise(0)) % 10)
        .cast("double").as("prediction"),
      (col("label") * 1.5 + 2.0).as("reg_prediction"))
    val acc = Pipelines.accuracy(preds)
    val rmse = Pipelines.rmse(
      preds.withColumnRenamed("prediction", "cls_prediction")
        .withColumnRenamed("reg_prediction", "prediction"), "label")
    preds.sparkSession.range(1).select(
      r4(lit(acc)).as("accuracy"), r4(lit(rmse)).as("rmse"))
  }

  /** M4 (rows-only): multinomial logistic regression — confusion counts. */
  val m4Logreg: Q = (s, d) => {
    val model = Pipelines.fitLogistic(embeddings(s, d))
    model.transform(Pipelines.embeddingFeatures(embeddings(s, d)))
      .groupBy(col("label").cast("int").as("label"),
        col("prediction").cast("int").as("prediction"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "prediction")
  }

  /** M5 (rows-only): full feature pipeline + linear regression; output
    * per-priority mean absolute error of the fit. */
  val m5Linreg: Q = (s, d) => {
    val (model, df) = Pipelines.fitPricePipeline(orders(s, d))
    model.transform(df)
      .groupBy("o_orderpriority")
      .agg(Orc.rN(avg(abs(col("prediction") - col("o_totalprice"))), 2).as("mae"))
      .orderBy("o_orderpriority")
  }

  /** M6 (rows-only): k-means cluster occupancy. */
  val m6Kmeans: Q = (s, d) => {
    val (km, feats) = Pipelines.fitKMeans(embeddings(s, d))
    km.fit(feats).transform(feats)
      .groupBy(col("prediction").as("cluster"))
      .agg(count(lit(1)).as("n"))
      .orderBy("cluster")
  }

  /** M7 (rows-only): ALS top-3 recommendations per user (sample). */
  val m7Als: Q = (s, d) => {
    val ratings = Pipelines.alsRatings(lineitem(s, d), orders(s, d))
    val model = Pipelines.fitAls(ratings)
    model.recommendForAllUsers(3)
      .select(col("user"), explode(col("recommendations.item")).as("item"))
      .groupBy("user").agg(count(lit(1)).as("n_recs"))
      .orderBy("user")
  }

  /** M1b: OneHotEncoder over the StringIndexer output (dropLast default)
    * rendered as indicator columns — fully deterministic, oracle-able. */
  val m9Onehot: Q = (s, d) => {
    val idx = new StringIndexer()
      .setInputCol("c_mktsegment").setOutputCol("seg_idx")
      .setStringOrderType("frequencyDesc")
    val ohe = new org.apache.spark.ml.feature.OneHotEncoder()
      .setInputCol("seg_idx").setOutputCol("seg_vec")
    val base = customer(s, d)
    val fitted = new org.apache.spark.ml.Pipeline()
      .setStages(Array(idx, ohe)).fit(base)
    val oh = vector_to_array(col("seg_vec"))
    fitted.transform(base).select(
      col("c_custkey"),
      element_at(oh, 1).cast("int").as("oh0"),
      element_at(oh, 2).cast("int").as("oh1"),
      element_at(oh, 3).cast("int").as("oh2"),
      element_at(oh, 4).cast("int").as("oh3"))
      .orderBy("c_custkey")
  }

  /** M2b: MinMaxScaler — column form (x - min) / (max - min). */
  val m10MinmaxScale: Q = (s, d) => {
    val df = customer(s, d).select(
      col("c_custkey"),
      org.apache.spark.ml.functions.array_to_vector(array(col("c_acctbal"))).as("v"))
    val scaler = new org.apache.spark.ml.feature.MinMaxScaler()
      .setInputCol("v").setOutputCol("scaled")
    scaler.fit(df).transform(df)
      .select(col("c_custkey"),
        r4(element_at(vector_to_array(col("scaled")), 1)).as("bal_01"))
      .orderBy("c_custkey")
  }

  /** M3b: QuantileDiscretizer — with `relativeError = 0` the split
    * points are exact data elements identical to `quantile_disc`
    * (verified at both oracle SFs), so the bucket histogram is
    * oracle-comparable under the Bucketizer's left-closed convention
    * (bucket i = [s_i, s_{i+1})); the near-equal-occupancy law stays in
    * the spec. */
  val m11QuantileDisc: Q = (s, d) => {
    val qd = new org.apache.spark.ml.feature.QuantileDiscretizer()
      .setInputCol("c_acctbal").setOutputCol("qbucket")
      .setNumBuckets(4).setRelativeError(0.0)
    qd.fit(customer(s, d)).transform(customer(s, d))
      .groupBy(col("qbucket").cast("int").as("qbucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("qbucket")
  }

  /** M4b (rows-only): seeded random forest — confusion counts. */
  val m12RandomForest: Q = (s, d) => {
    val model = Pipelines.fitRandomForest(embeddings(s, d))
    model.transform(Pipelines.embeddingFeatures(embeddings(s, d)))
      .groupBy(col("label").cast("int").as("label"),
        col("prediction").cast("int").as("prediction"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "prediction")
  }

  /** M4c (rows-only): gaussian naive Bayes — per-class prediction counts. */
  val m13NaiveBayes: Q = (s, d) => {
    val model = Pipelines.fitNaiveBayes(embeddings(s, d))
    model.transform(Pipelines.embeddingFeatures(embeddings(s, d)))
      .groupBy(col("prediction").cast("int").as("prediction"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prediction")
  }

  /** M9 (rows-only): CrossValidator model selection — the chosen
    * hyper-parameter on a seeded 2-fold grid. */
  val m14Crossval: Q = (s, d) => {
    val (bestReg, _) =
      Pipelines.crossValidateLogistic(Pipelines.embeddingFeatures(embeddings(s, d)))
    s.range(1).select(r4(lit(bestReg)).as("best_reg_param"))
  }

  /** M10: pipeline persistence — save + load a deterministic feature
    * pipeline, transform with the LOADED model; oracle-checked, so a
    * broken round-trip fails the hash compare. */
  val m15PipelinePersist: Q = (s, d) => {
    val base = customer(s, d)
    val loaded = Pipelines.saveLoadFeaturePipeline(base)
    loaded.transform(base)
      .select(col("c_custkey"),
        col("seg_idx").cast("int").as("seg_idx"),
        col("bucket").cast("int").as("bucket"))
      .orderBy("c_custkey")
  }

  /** M16: HashingTF + IDF text featurization — the fixed-dimension,
    * vocabulary-free featurizer (murmur3 bucket per token, so it needs
    * no fitted dictionary and scales embarrassingly; IDF is one fitted
    * vector broadcast into the transform). Output: per-document feature
    * norms and active-slot counts (engine-specific hashing → no SQL
    * oracle; invariants live in MlSpec: dimension bound, idf of a
    * universal token ≈ 0, norm positivity).
    */
  val m16HashingTfidf: Q = (s, d) => {
    import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer}
    val docs = documents(s, d).select("doc_id", "text")
    val tok = new RegexTokenizer().setInputCol("text").setOutputCol("toks")
      .setPattern("\\W+")
    val tf = new HashingTF().setInputCol("toks").setOutputCol("tf")
      .setNumFeatures(1024)
    val tfd = tf.transform(tok.transform(docs))
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(tfd)
    val arr = org.apache.spark.ml.functions.vector_to_array(col("tfidf"))
    idf.transform(tfd)
      .select(col("doc_id"),
        Orc.r4(aggregate(arr, lit(0.0), (a, x) => a + x * x)).as("sq_norm4"),
        size(filter(arr, x => x > 0)).as("n_active"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "m16_hashing_tfidf" -> m16HashingTfidf,
    "m1_string_indexer" -> m1StringIndexer,
    "m2_standard_scale" -> m2StandardScale,
    "m3_bucketizer" -> m3Bucketizer,
    "m8_eval_metrics" -> m8EvalMetrics,
    "m4_logreg" -> m4Logreg,
    "m5_linreg" -> m5Linreg,
    "m6_kmeans" -> m6Kmeans,
    "m7_als" -> m7Als,
    "m9_onehot" -> m9Onehot,
    "m10_minmax_scale" -> m10MinmaxScale,
    "m11_quantile_disc" -> m11QuantileDisc,
    "m12_random_forest" -> m12RandomForest,
    "m13_naive_bayes" -> m13NaiveBayes,
    "m14_crossval" -> m14Crossval,
    "m15_pipeline_persist" -> m15PipelinePersist,
  )

  val oracleSql: Map[String, String] = Map(
    "m11_quantile_disc" ->
      """WITH q AS (
        |  SELECT quantile_disc(c_acctbal, 0.25) AS q1,
        |         quantile_disc(c_acctbal, 0.5)  AS q2,
        |         quantile_disc(c_acctbal, 0.75) AS q3
        |  FROM customer)
        |SELECT CASE WHEN c_acctbal < q1 THEN 0
        |            WHEN c_acctbal < q2 THEN 1
        |            WHEN c_acctbal < q3 THEN 2
        |            ELSE 3 END AS qbucket,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM customer CROSS JOIN q
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "m1_string_indexer" ->
      """SELECT c_mktsegment, CAST(dense_rank() OVER (ORDER BY cnt DESC, c_mktsegment ASC) - 1 AS INT) AS seg_idx
        |FROM (SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY 1) t
        |ORDER BY seg_idx""".stripMargin,
    "m2_standard_scale" ->
      """SELECT c_custkey,
        | round((c_acctbal - avg(c_acctbal) OVER ()) / stddev_samp(c_acctbal) OVER (), 4) AS bal_z
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "m3_bucketizer" ->
      """SELECT c_custkey,
        | CASE WHEN c_acctbal < 0 THEN 0
        |      WHEN c_acctbal < 2500 THEN 1
        |      WHEN c_acctbal < 5000 THEN 2
        |      WHEN c_acctbal < 7500 THEN 3
        |      ELSE 4 END AS bucket
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "m8_eval_metrics" ->
      """WITH p AS (
        | SELECT label,
        |  CAST((label + CASE WHEN vec_id % 3 = 0 THEN 1 ELSE 0 END) % 10 AS DOUBLE) AS prediction,
        |  label * 1.5 + 2.0 AS reg_prediction
        | FROM embeddings)
        |SELECT
        | round(avg(CASE WHEN prediction = label THEN 1.0 ELSE 0.0 END), 4) AS accuracy,
        | round(sqrt(avg((reg_prediction - label) * (reg_prediction - label))), 4) AS rmse
        |FROM p""".stripMargin,
    "m9_onehot" ->
      """WITH m AS (
        | SELECT c_mktsegment,
        |        dense_rank() OVER (ORDER BY cnt DESC, c_mktsegment ASC) - 1 AS idx
        | FROM (SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY 1) t)
        |SELECT c.c_custkey,
        | CAST(CASE WHEN m.idx = 0 THEN 1 ELSE 0 END AS INT) AS oh0,
        | CAST(CASE WHEN m.idx = 1 THEN 1 ELSE 0 END AS INT) AS oh1,
        | CAST(CASE WHEN m.idx = 2 THEN 1 ELSE 0 END AS INT) AS oh2,
        | CAST(CASE WHEN m.idx = 3 THEN 1 ELSE 0 END AS INT) AS oh3
        |FROM customer c JOIN m USING (c_mktsegment)
        |ORDER BY c_custkey""".stripMargin,
    "m10_minmax_scale" ->
      """SELECT c_custkey,
        | round((c_acctbal - min(c_acctbal) OVER ()) /
        |       (max(c_acctbal) OVER () - min(c_acctbal) OVER ()), 4) AS bal_01
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "m15_pipeline_persist" ->
      """WITH m AS (
        | SELECT c_mktsegment,
        |        CAST(dense_rank() OVER (ORDER BY cnt DESC, c_mktsegment ASC) - 1 AS INT) AS seg_idx
        | FROM (SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY 1) t)
        |SELECT c.c_custkey, m.seg_idx,
        | CASE WHEN c_acctbal < 0 THEN 0
        |      WHEN c_acctbal < 2500 THEN 1
        |      WHEN c_acctbal < 5000 THEN 2
        |      WHEN c_acctbal < 7500 THEN 3
        |      ELSE 4 END AS bucket
        |FROM customer c JOIN m USING (c_mktsegment)
        |ORDER BY c_custkey""".stripMargin,
  )
}
