package graft

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.functions._

import graft.ml.Pipelines

class MlSpec extends SparkSpec {

  private def blobs(n: Int = 300, seed: Int = 11) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val centers = Array(Array(5.0, 5.0), Array(-5.0, 5.0), Array(0.0, -5.0))
    (0 until n).map { i =>
      val k = i % 3
      val f = centers(k).map(c => (c + rnd.nextGaussian() * 0.5).toFloat)
      (i.toLong, k.toDouble, f)
    }.toDF("id", "label", "arr")
      .select(col("id"), col("label"), array_to_vector(col("arr")).as("features"))
  }

  test("every M5 query runs at sf0.001") {
    graft.queries.MlQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() >= 0, s"$name failed")
    }
  }

  test("M4: logistic regression separates gaussian blobs (acc > 0.95)") {
    val df = blobs()
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(25).setFeaturesCol("features").setLabelCol("label")
    val acc = Pipelines.accuracy(lr.fit(df).transform(df))
    assert(acc > 0.95, s"accuracy $acc")
  }

  test("M5: linear regression recovers y = 2x + 1") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toDouble, 2.0 * i + 1.0))
      .toDF("x", "y")
      .select(array_to_vector(array(col("x"))).as("features"), col("y"))
    val m = new org.apache.spark.ml.regression.LinearRegression()
      .setLabelCol("y").setMaxIter(20).fit(df)
    assert(math.abs(m.coefficients(0) - 2.0) < 1e-4)
    assert(math.abs(m.intercept - 1.0) < 1e-3)
  }

  test("M6: k-means k=3 cost is far below k=2 cost on 3 blobs") {
    val df = blobs()
    val km3 = new org.apache.spark.ml.clustering.KMeans().setK(3).setSeed(42L)
      .fit(df)
    val km2 = new org.apache.spark.ml.clustering.KMeans().setK(2).setSeed(42L)
      .fit(df)
    assert(km3.summary.trainingCost < km2.summary.trainingCost / 5)
  }

  test("M6: k-means purity computed per dominant label > 0.95") {
    val df = blobs()
    val km = new org.apache.spark.ml.clustering.KMeans().setK(3).setSeed(42L).fit(df)
    val assigns = km.transform(df).groupBy("prediction", "label").count()
    val purity = assigns
      .groupBy("prediction")
      .agg(max("count").as("dominant"), sum("count").as("total"))
      .agg(sum("dominant") / sum("total")).head().getDouble(0)
    assert(purity > 0.95, s"purity $purity")
  }

  test("M7: ALS reconstructs seen ratings with bounded RMSE") {
    val ratings = Pipelines.alsRatings(
      Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir))
    val model = Pipelines.fitAls(ratings)
    model.setColdStartStrategy("drop")
    val preds = model.transform(ratings)
    val rmse = Pipelines.rmse(preds.withColumnRenamed("rating", "y"), "y")
    val sd = ratings.agg(stddev_samp(col("rating"))).head().getDouble(0)
    assert(rmse < sd, s"rmse $rmse should beat rating stddev $sd")
  }

  test("M9: cross-validation picks a low regParam on separable data") {
    val (bestReg, bestAcc) = Pipelines.crossValidateLogistic(blobs())
    assert(bestReg < 10.0, s"picked $bestReg")
    assert(bestAcc > 0.9)
  }

  test("M10: pipeline persistence round-trip preserves predictions") {
    val dir = new java.io.File("target/tmp/m10_pipeline").getAbsolutePath
    val model = Pipelines.fitLogistic(Tables.embeddings(spark, sfDir))
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    val feats = Pipelines.embeddingFeatures(Tables.embeddings(spark, sfDir))
    val a = model.transform(feats).select("vec_id", "prediction")
    val b = loaded.transform(feats).select("vec_id", "prediction")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("M4b: random forest separates gaussian blobs (acc > 0.95)") {
    val df = blobs()
    val rf = new org.apache.spark.ml.classification.RandomForestClassifier()
      .setNumTrees(10).setSeed(42).setFeaturesCol("features").setLabelCol("label")
    val preds = rf.fit(df).transform(df)
    assert(Pipelines.accuracy(preds) > 0.95)
  }

  test("M4c: gaussian naive Bayes separates gaussian blobs (acc > 0.95)") {
    val df = blobs()
    val nb = new org.apache.spark.ml.classification.NaiveBayes()
      .setModelType("gaussian").setFeaturesCol("features").setLabelCol("label")
    val preds = nb.fit(df).transform(df)
    assert(Pipelines.accuracy(preds) > 0.95)
  }

  test("M3b: exact quantile discretizer gives near-equal bucket occupancy") {
    val counts = graft.queries.MlQueries.m11QuantileDisc(spark, sfDir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(0, 1, 2, 3), s"buckets: ${counts.keySet}")
    val n = counts.values.sum.toDouble
    counts.values.foreach(c => assert(math.abs(c / n - 0.25) < 0.05, counts.toString))
  }

  test("M10: loaded feature pipeline equals the in-memory fit") {
    val base = Tables.customer(spark, sfDir)
    val loaded = Pipelines.saveLoadFeaturePipeline(base)
    val out = loaded.transform(base).select("c_custkey", "seg_idx", "bucket")
    // spot-check against direct computation
    val direct = graft.queries.MlQueries.m15PipelinePersist(spark, sfDir)
    assert(out.exceptAll(
      direct.select(col("c_custkey"), col("seg_idx").cast("double"),
        col("bucket").cast("double"))).count() == 0)
  }

  test("M16: hashed tf-idf invariants (dimension bound, universal-token idf)") {
    val out = graft.queries.MlQueries.m16HashingTfidf(spark, sfDir)
    val rows = out.collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    // active slots bounded by the hash dimension, norms non-negative
    assert(rows.forall(_.getInt(2) <= 1024))
    assert(rows.forall(_.getDouble(1) >= 0.0))
    // a token present in EVERY document carries idf = ln((n+1)/(n+1)) = 0,
    // so a corpus of identical docs has all-zero tf-idf vectors
    import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer}
    import spark.implicits._
    val same = Seq.fill(8)("alpha beta").toDF("text")
    val tok = new RegexTokenizer().setInputCol("text").setOutputCol("toks")
      .setPattern("\\W+")
    val tf = new HashingTF().setInputCol("toks").setOutputCol("tf")
      .setNumFeatures(64)
    val tfd = tf.transform(tok.transform(same))
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(tfd)
    val norms = idf.transform(tfd)
      .select(aggregate(vector_to_array(col("tfidf")), lit(0.0),
        (a, x) => a + x * x).as("n")).collect().map(_.getDouble(0))
    assert(norms.forall(_ == 0.0), "universal tokens must have zero idf")
  }

  test("M8: evaluator metrics equal their SQL formulas") {
    val row = graft.queries.MlQueries.m8EvalMetrics(spark, sfDir).head()
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("double").as("label"))
      .withColumn("pred",
        ((col("label") + when(col("vec_id") % 3 === 0, 1).otherwise(0)) % 10))
    val acc = e.agg(avg(when(col("pred") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(row.getDouble(0) == math.rint(acc * 1e4) / 1e4)
  }
}
