package graft.operators

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinHashLSH}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (SURVEY.md §2.10 L3–L5).
  *
  * Brute force is exact and O(n²) — correct baseline and oracle-checkable;
  * the LSH route is the scale path: bucket first, compare only within
  * buckets, so the pair count is driven by bucket occupancy, not n².
  */
object Similarity {

  /** L4: exact top-k nearest neighbours by cosine for each query vector.
    * Broadcast the corpus side when it fits (the common "queries >> dims"
    * shape); the codegen cosine kernel keeps the inner loop tight.
    */
  def bruteForceTopK(
      queries: DataFrame,   // (id, embedding)
      corpus: DataFrame,    // (id, embedding)
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
    val c = corpus.select(col(idCol).as("c_id"), col(embCol).as("c_emb"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("c_id").asc)
    q.join(broadcast(c), col("q_id") =!= col("c_id"))
      .withColumn("cos", cosineSim(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rn"))
  }

  /** L5: approximate nearest neighbours via random-projection LSH
    * (MLlib). Normalised vectors make Euclidean distance monotone in
    * cosine: d² = 2 - 2·cos, so the Euclidean LSH family serves cosine
    * top-k. Returns (q_id, c_id, cos, rn) like bruteForceTopK.
    */
  def annTopK(
      df: DataFrame,
      k: Int,
      bucketLength: Double = 2.0,
      numHashTables: Int = 3,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      seed: Long = 42L): DataFrame = {
    val normed = df
      .withColumn("_norm", l2Norm(col(embCol)))
      .where(col("_norm") > 0)
      .select(
        col(idCol).as("id"), col(embCol).as("emb"),
        array_to_vector(expr(s"transform($embCol, x -> cast(x as double) / _norm)"))
          .as("features"))

    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed)
    val model = lsh.fit(normed)
    val pairs = model
      .approxSimilarityJoin(normed, normed, 2.0, "dist")
      .where(col("datasetA.id") =!= col("datasetB.id"))
      .select(
        col("datasetA.id").as("q_id"),
        col("datasetB.id").as("c_id"),
        col("datasetA.emb").as("q_emb"),
        col("datasetB.emb").as("c_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    pairs
      .withColumn("cos", cosineSim(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rn"))
  }

  /** MLlib MinHashLSH near-dup join over token sets (the library route;
    * TextOps.minHashCandidates is the from-scratch route). */
  def minHashSimilarityJoin(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.6,
      numHashTables: Int = 5,
      seed: Long = 42L): DataFrame = {
    val cv = new org.apache.spark.ml.feature.CountVectorizer()
      .setInputCol("toks").setOutputCol("features").setBinary(true)
    val toks = df.select(col(idCol).as("id"),
      array_distinct(split(col(textCol), " ")).as("toks"))
    val vecs = cv.fit(toks).transform(toks)
      .where(expr("aggregate(transform(toks, t -> 1), 0, (a, x) -> a + x) > 0"))
    val mh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(seed)
    val model = mh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, threshold, "jaccard_dist")
      .where(col("datasetA.id") < col("datasetB.id"))
      .select(
        col("datasetA.id").as("a_id"),
        col("datasetB.id").as("b_id"),
        col("jaccard_dist"))
  }
}
