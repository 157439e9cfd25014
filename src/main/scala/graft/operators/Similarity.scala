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

  /** L4 at scale: same top-k semantics as [[bruteForceTopK]] but through
    * the map-side bounded-heap aggregate instead of a window sort — the
    * shuffle after the pair scan carries at most k entries per query
    * vector rather than every scored pair. This is the verification
    * shape for LSH/IVF candidate sets at 100 TB. */
  def bruteForceTopKAgg(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
    val c = corpus.select(col(idCol).as("c_id"), col(embCol).as("c_emb"))
    q.join(broadcast(c), col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosineSim(col("q_emb"), col("c_emb")).as("cos"))
      .groupBy("q_id")
      .agg(org.apache.spark.sql.graft.TopKByScore.topK(col("cos"), col("c_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.tie").as("c_id"), col("e.score").as("cos"),
        (col("pos") + 1).as("rn"))
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

  /** L5 scale path #2 — IVF (inverted-file) ANN: a KMeans coarse
    * quantizer partitions the corpus into `nlist` cells; each query
    * probes only its `nprobe` nearest cells, so the pair count is
    * ~ n²·(nprobe/nlist) instead of n². The cell assignment is one
    * KMeans fit + transform; probing is a broadcast join against the
    * (tiny) centroid table. This is the standard IVF-flat layout used by
    * vector stores, expressed in DataFrame ops.
    */
  def ivfTopK(
      df: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val feats = df.select(
      col(idCol).as("id"), col(embCol).as("emb"),
      array_to_vector(col(embCol)).as("features"))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(nlist).setSeed(seed).setFeaturesCol("features")
    val model = km.fit(feats)
    val assigned = model.transform(feats)
      .select(col("id"), col("emb"), col("prediction").as("cell"))

    // tiny centroid table: nlist rows, broadcast everywhere
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }.toSeq
      .toDF("cell", "centroid")

    // nprobe nearest cells per query vector
    val wProbe = Window.partitionBy("id").orderBy(col("cdist").asc, col("cell").asc)
    val probes = assigned.select(col("id"), col("emb"))
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", -dotProduct(col("emb"), col("centroid")) * 2 +
        dotProduct(col("centroid"), col("centroid")))
      .withColumn("pr", row_number().over(wProbe))
      .where(col("pr") <= nprobe)
      .select(col("id").as("q_id"), col("emb").as("q_emb"), col("cell"))

    // compare only within probed cells
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("c_id").asc)
    probes
      .join(assigned.select(col("id").as("c_id"), col("emb").as("c_emb"), col("cell")),
        Seq("cell"))
      .where(col("q_id") =!= col("c_id"))
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
