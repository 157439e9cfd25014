package graft.queries

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.{LogisticRegression, OneVsRest}
import org.apache.spark.ml.clustering.{BisectingKMeans, GaussianMixture, LDA}
import org.apache.spark.ml.feature.{CountVectorizer, Imputer, RegexTokenizer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.ml.Pipelines

/** Round-9 wave 1: the remaining standard MLlib estimator vocabulary —
  * imputation, one-vs-rest reduction, and the three non-KMeans
  * clustering families (GMM, bisecting k-means, LDA).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.11 (ML pipeline breadth, M1–M10 umbrella).
  *
  * Scale notes: every fit here is bounded model state (means, mixture
  * params, topic matrix) broadcast into a distributed transform — no
  * all-pairs, no driver-side per-row loop. Imputer's fit is one
  * aggregate over the column; OvR trains k independent binary models
  * over the same cached features; LDA's EM iterations are joins over
  * the (doc, term) count matrix, never a dense corpus collect.
  */
object SurfaceR9 {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M36: Imputer (mean strategy) — nulls are injected deterministically
    * (every 7th customer's balance), the imputer fits the mean of the
    * surviving values, and the filled column is bit-checked against the
    * SQL coalesce(bal, avg(bal)) form. The fit is a single aggregate;
    * the transform is a broadcast scalar — the exact shape a 100 TB
    * imputation must take. */
  val m36Imputer: Q = (s, d) => {
    val base = customer(s, d).select(
      col("c_custkey"),
      when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_acctbal"))
        .cast("double").as("bal"))
    val imp = new Imputer()
      .setStrategy("mean").setInputCol("bal").setOutputCol("bal_filled")
    imp.fit(base).transform(base)
      .select(col("c_custkey"), r4(col("bal_filled")).as("bal_filled"))
      .orderBy("c_custkey")
  }

  /** M37 (rows-only): OneVsRest reduction — k seeded binary logistic
    * models over the 10-class embeddings, reported as confusion counts
    * (m4 shape). Accuracy-beats-majority is MlSpec's law. */
  val m37Onevsrest: Q = (s, d) => {
    val feats = Pipelines.embeddingFeatures(embeddings(s, d))
    val ovr = new OneVsRest()
      .setClassifier(new LogisticRegression().setMaxIter(20).setRegParam(0.01))
      .setFeaturesCol("features").setLabelCol("label")
    new Pipeline().setStages(Array(ovr)).fit(feats).transform(feats)
      .groupBy(col("label").cast("int").as("label"),
        col("prediction").cast("int").as("prediction"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "prediction")
  }

  /** M38 (rows-only): seeded Gaussian mixture — soft clustering rendered
    * as hard-assignment occupancy. Mixture weights/means are bounded
    * model state; the E-step transform is distributed. Fitted on the
    * first 8 embedding dims: full-covariance GMM needs samples ≫ dim²
    * (the 64-dim fit degenerates to a non-symmetric covariance at small
    * SF), and GMM-after-projection is the standard pipeline shape. */
  val m38Gmm: Q = (s, d) => {
    val feats = embeddings(s, d).select(
      col("vec_id"),
      org.apache.spark.ml.functions.array_to_vector(
        slice(col("embedding"), 1, 8)).as("features"))
    val gmm = new GaussianMixture().setK(5).setSeed(42L)
      .setFeaturesCol("features")
    gmm.fit(feats).transform(feats)
      .groupBy(col("prediction").as("cluster"))
      .agg(count(lit(1)).as("n"))
      .orderBy("cluster")
  }

  /** M39 (rows-only): seeded bisecting k-means — the hierarchical
    * divisive variant (top-down splits, no random restarts), occupancy
    * per leaf cluster. */
  val m39BisectingKmeans: Q = (s, d) => {
    val feats = Pipelines.embeddingFeatures(embeddings(s, d))
    val bkm = new BisectingKMeans().setK(8).setSeed(42L)
      .setFeaturesCol("features")
    bkm.fit(feats).transform(feats)
      .groupBy(col("prediction").as("cluster"))
      .agg(count(lit(1)).as("n"))
      .orderBy("cluster")
  }

  /** M40 (rows-only): seeded LDA (EM optimizer — deterministic given
    * seed+partitioning, unlike online's per-iteration subsampling) over
    * the documents corpus: tokenize → count-vectorize → 3 topics; the
    * output is each topic's top-5 term indices, rank-exploded. Topic
    * state is a vocabSize×k matrix — bounded, broadcastable; the
    * E-step joins over (doc, term) counts and scales with the corpus. */
  val m40Lda: Q = (s, d) => {
    val docs = documents(s, d).select("doc_id", "text")
    val tok = new RegexTokenizer().setInputCol("text").setOutputCol("toks")
      .setPattern("\\W+")
    val cv = new CountVectorizer().setInputCol("toks").setOutputCol("features")
      .setVocabSize(1000).setMinDF(2)
    val counts = cv.fit(tok.transform(docs)).transform(tok.transform(docs))
    val lda = new LDA().setK(3).setSeed(42L).setMaxIter(15)
      .setOptimizer("em").setFeaturesCol("features")
    lda.fit(counts).describeTopics(5)
      .select(col("topic"), posexplode(col("termIndices")).as(Seq("rank", "term_idx")))
      .orderBy("topic", "rank")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m36_imputer" -> m36Imputer,
    "m37_onevsrest" -> m37Onevsrest,
    "m38_gmm" -> m38Gmm,
    "m39_bisecting_kmeans" -> m39BisectingKmeans,
    "m40_lda" -> m40Lda)

  val oracleSql: Map[String, String] = Map(
    "m36_imputer" ->
      """WITH b AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL
        |         ELSE c_acctbal END AS bal
        |  FROM customer),
        |m AS (SELECT avg(bal) AS mu FROM b)
        |SELECT c_custkey, round(coalesce(bal, mu), 4) AS bal_filled
        |FROM b CROSS JOIN m ORDER BY c_custkey""".stripMargin)
}
