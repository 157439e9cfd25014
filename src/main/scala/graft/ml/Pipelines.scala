package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.{MulticlassClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.feature._
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib pipeline surface (SURVEY.md §2.11): the standard estimator
  * vocabulary wired for the fixture tables, everything seeded for
  * determinism. Model quality is asserted in specs with metric bounds —
  * model outputs are never oracle-compared (SURVEY.md §5.3 / §7.4).
  *
  * Scale: MLlib estimators are themselves Spark jobs (treeAggregate
  * per iteration); nothing here adds driver-side loops beyond what the
  * estimator already does.
  */
object Pipelines {

  /** embeddings(vec_id, embedding array<float>, label) -> features frame. */
  def embeddingFeatures(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id"),
      col("label").cast("double").as("label"),
      array_to_vector(col("embedding")).as("features"))

  /** M4: multinomial logistic regression on the embeddings table. */
  def fitLogistic(embeddings: DataFrame, maxIter: Int = 20): PipelineModel = {
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(0.01).setFeaturesCol("features")
      .setLabelCol("label")
    new Pipeline().setStages(Array(lr)).fit(embeddingFeatures(embeddings))
  }

  /** M1+M2+M5: indexing + one-hot + assembly + scaling + linear
    * regression predicting o_totalprice from order features. */
  def fitPricePipeline(orders: DataFrame): (PipelineModel, DataFrame) = {
    val df = orders.select(
      col("o_orderkey"),
      col("o_orderpriority"), col("o_orderstatus"),
      month(col("o_orderdate")).cast("double").as("o_month"),
      col("o_totalprice"))
    val idx = new StringIndexer()
      .setInputCols(Array("o_orderpriority", "o_orderstatus"))
      .setOutputCols(Array("prio_idx", "status_idx"))
    val ohe = new OneHotEncoder()
      .setInputCols(Array("prio_idx", "status_idx"))
      .setOutputCols(Array("prio_vec", "status_vec"))
    val asm = new VectorAssembler()
      .setInputCols(Array("prio_vec", "status_vec", "o_month"))
      .setOutputCol("raw_features")
    val scaler = new StandardScaler()
      .setInputCol("raw_features").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    val lin = new LinearRegression()
      .setLabelCol("o_totalprice").setFeaturesCol("features")
      .setMaxIter(30).setRegParam(0.1)
    val model = new Pipeline()
      .setStages(Array(idx, ohe, asm, scaler, lin)).fit(df)
    (model, df)
  }

  /** M6: k-means over embeddings, fixed seed. */
  def fitKMeans(embeddings: DataFrame, k: Int = 10, seed: Long = 42L): (KMeans, DataFrame) = {
    val feats = embeddingFeatures(embeddings)
    (new KMeans().setK(k).setSeed(seed).setFeaturesCol("features"), feats)
  }

  /** M7: ALS on (customer, part, sum quantity) implicit-ish ratings. */
  def alsRatings(lineitem: DataFrame, orders: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").cast("int").as("user"),
        col("l_partkey").cast("int").as("item"))
      .agg(sum("l_quantity").cast("float").as("rating"))

  def fitAls(ratings: DataFrame, rank: Int = 8, seed: Long = 42L) = {
    new ALS().setRank(rank).setMaxIter(8).setRegParam(0.1).setSeed(seed)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .fit(ratings)
  }

  /** M9: cross-validated logistic regression; returns (bestRegParam, cv
    * accuracy of best model). */
  def crossValidateLogistic(train: DataFrame, seed: Long = 42L): (Double, Double) = {
    val lr = new LogisticRegression().setMaxIter(15)
      .setFeaturesCol("features").setLabelCol("label")
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.001, 0.1, 10.0)).build()
    val cv = new CrossValidator()
      .setEstimator(lr)
      .setEvaluator(new MulticlassClassificationEvaluator()
        .setLabelCol("label").setMetricName("accuracy"))
      .setEstimatorParamMaps(grid).setNumFolds(2).setSeed(seed)
    val model = cv.fit(train)
    val best = model.bestModel.asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    (best.getRegParam, model.avgMetrics.max)
  }

  /** M4 (ensemble): seeded random forest on the embeddings table. */
  def fitRandomForest(embeddings: DataFrame, trees: Int = 20, seed: Long = 42L): PipelineModel = {
    val rf = new org.apache.spark.ml.classification.RandomForestClassifier()
      .setNumTrees(trees).setMaxDepth(8).setSeed(seed)
      .setFeaturesCol("features").setLabelCol("label")
    new Pipeline().setStages(Array(rf)).fit(embeddingFeatures(embeddings))
  }

  /** M4 (generative): Gaussian naive Bayes — the only NB modelType that
    * accepts the negative-valued embedding features. */
  def fitNaiveBayes(embeddings: DataFrame): PipelineModel = {
    val nb = new org.apache.spark.ml.classification.NaiveBayes()
      .setModelType("gaussian").setFeaturesCol("features").setLabelCol("label")
    new Pipeline().setStages(Array(nb)).fit(embeddingFeatures(embeddings))
  }

  /** M10: fit a deterministic feature-only pipeline, save it, load it
    * back, and return the LOADED model — callers transform with it, so
    * persistence is exercised on the oracle-checked path. */
  def saveLoadFeaturePipeline(customer: DataFrame): PipelineModel = {
    val idx = new StringIndexer()
      .setInputCol("c_mktsegment").setOutputCol("seg_idx")
      .setStringOrderType("frequencyDesc")
    val buck = new Bucketizer()
      .setInputCol("c_acctbal").setOutputCol("bucket")
      .setSplits(Array(Double.NegativeInfinity, 0.0, 2500.0, 5000.0, 7500.0,
        Double.PositiveInfinity))
    val model = new Pipeline().setStages(Array(idx, buck)).fit(customer)
    val dir = java.nio.file.Files.createTempDirectory("graft_pipeline_").toString
    model.write.overwrite().save(dir)
    PipelineModel.load(dir)
  }

  def accuracy(preds: DataFrame, labelCol: String = "label"): Double =
    new MulticlassClassificationEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction")
      .setMetricName("accuracy").evaluate(preds)

  def rmse(preds: DataFrame, labelCol: String): Double =
    new RegressionEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction")
      .setMetricName("rmse").evaluate(preds)
}
