package graft.queries

import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.feature.Word2Vec
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.ml.Pipelines

/** Round-6 wave 6: geospatial radius join via grid bucketing (the
  * spatial analogue of the banded/bucketed joins elsewhere in the repo),
  * L2 normalization checked against exact SQL arithmetic, Word2Vec token
  * embeddings, and gradient-boosted trees.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.3 (joins), §2.11 (MLlib surface).
  */
object SurfaceR6i extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- J12: geo radius join ----

  /** Deterministic synthetic coordinates: two md5 nibble pairs of the
    * entity key → (lat ∈ [-44.8, 44.45], lon ∈ [-89.6, 88.9]).
    * Pure function of the key, so both engines derive identical
    * positions (the same instr-on-hex trick as lp10's split). */
  private[queries] def nib(key: String, p: Int): String =
    s"(instr('0123456789abcdef', substr(md5(cast($key as string)), $p, 1)) - 1)"
  private[queries] def latSql(key: String): String =
    s"((${nib(key, 1)} * 16 + ${nib(key, 2)}) * 0.35 - 44.8)"
  private[queries] def lonSql(key: String): String =
    s"((${nib(key, 3)} * 16 + ${nib(key, 4)}) * 0.7 - 89.6)"

  private def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dlat = radians(lat2 - lat1) / 2.0
    val dlon = radians(lon2 - lon1) / 2.0
    lit(2.0 * 6371.0) * asin(sqrt(
      pow(sin(dlat), 2.0) +
        cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dlon), 2.0)))
  }

  /** J12: all (supplier, customer) pairs within 500 km — the spatial
    * radius join. Candidates come from a lat/lon GRID equi-join, not a
    * cross product: each supplier probes its cell and the 8 neighbors
    * (cell sizes 5°×7° chosen so 500 km can never span two cell
    * boundaries at these latitudes — recall 1.0 by construction, the
    * geo analogue of ld's triangle-inequality multiprobe), and exact
    * haversine verifies each candidate. Cost is candidate-bounded →
    * scales to planet-sized tables as a plain equi-join on (cell_lat,
    * cell_lon); the 9× probe explosion rides on the SMALLER side. The
    * oracle brute-forces the full cross product, so the bucketing's
    * completeness is hash-checked (closest miss sits 0.6 km from the
    * threshold — far above float noise).
    */
  val j12GeoJoin: Q = (s, d) => {
    val cust = customer(s, d).select(col("c_custkey"),
      expr(latSql("c_custkey")).as("lat"), expr(lonSql("c_custkey")).as("lon"))
      .withColumn("cell_lat", floor(col("lat") / 5.0))
      .withColumn("cell_lon", floor(col("lon") / 7.0))
    val supp = supplier(s, d).select(col("s_suppkey"),
      expr(latSql("s_suppkey")).as("s_lat"), expr(lonSql("s_suppkey")).as("s_lon"))
      .withColumn("dx", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("dy", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("cell_lat", floor(col("s_lat") / 5.0) + col("dx"))
      .withColumn("cell_lon", floor(col("s_lon") / 7.0) + col("dy"))
    supp.join(cust, Seq("cell_lat", "cell_lon"))
      .withColumn("dist_km",
        haversineKm(col("s_lat"), col("s_lon"), col("lat"), col("lon")))
      .where(col("dist_km") < 500.0)
      .select(col("s_suppkey"), col("c_custkey"), r4(col("dist_km")).as("dist_km"))
      .orderBy("s_suppkey", "c_custkey")
  }

  // ---- M23: L2 normalization (oracle-checked feature math) ----

  /** M23: ml.feature.Normalizer (p=2) over the embedding corpus, checked
    * against the exact x/‖x‖ arithmetic in SQL — the MLlib transform
    * itself is hash-compared, not just law-specced. Row-local math: a
    * narrow shuffle-free projection at any scale. Zero-norm vectors are
    * excluded on both sides (the fixtures contain some; Normalizer would
    * pass them through unchanged, which no SQL arithmetic reproduces).
    */
  val m23Normalizer: Q = (s, d) => {
    val nz = embeddings(s, d)
      .where(expr("aggregate(embedding, 0D, (a, x) -> a + cast(x as double) * cast(x as double))") > 0)
      .withColumn("v", array_to_vector(col("embedding")))
    val norm = new org.apache.spark.ml.feature.Normalizer()
      .setInputCol("v").setOutputCol("nv").setP(2.0)
    norm.transform(nz)
      .withColumn("arr", vector_to_array(col("nv")))
      .select(col("vec_id"),
        r4(col("arr").getItem(0)).as("c0"),
        r4(col("arr").getItem(1)).as("c1"),
        r4(col("arr").getItem(2)).as("c2"),
        // round to the house 1e-4 grid BEFORE the threshold so a
        // component within 1 ulp of 0.1 can't flip the count between
        // engines
        expr("size(filter(arr, x -> round(x, 4) > 0.1))").as("n_big"))
      .orderBy("vec_id")
  }

  // ---- M24: Word2Vec ----

  /** M24 (rows-only): Word2Vec token embeddings over the corpus —
    * seeded, single-partition, one iteration, so the fit is
    * deterministic; engine-specific float math keeps it off the oracle
    * path (laws live in SurfaceR6iSpec). Output: per-token vector norms
    * for the vocabulary. Scale: training is the bottleneck (driver-side
    * vocab, distributed skip-gram); inference is a broadcast-map lookup.
    */
  val m24Word2vec: Q = (s, d) => {
    val docs = documents(s, d)
      .select(split(col("text"), " ").as("toks"))
    val w2v = new Word2Vec().setInputCol("toks").setOutputCol("wv")
      .setVectorSize(16).setSeed(42L).setMinCount(20)
      .setNumPartitions(1).setMaxIter(1)
    val model = w2v.fit(docs)
    model.getVectors
      .withColumn("arr", vector_to_array(col("vector")))
      .select(col("word"),
        expr("size(arr)").as("dim"),
        r4(sqrt(expr("aggregate(arr, 0D, (a, x) -> a + x * x)"))).as("norm"))
      .orderBy("word")
  }

  // ---- M25: gradient-boosted trees ----

  /** M25 (rows-only): GBTClassifier on the embedding corpus with a
    * binarized target (label mod 2) — the boosted-ensemble member of the
    * M4 classification family; seeded, confusion-matrix output like
    * m12; accuracy bound lives in the spec. */
  val m25Gbt: Q = (s, d) => {
    val feats = Pipelines.embeddingFeatures(embeddings(s, d))
      .withColumn("blabel", (col("label") % 2).cast("double"))
    val gbt = new GBTClassifier().setLabelCol("blabel")
      .setFeaturesCol("features").setMaxIter(10).setMaxDepth(3).setSeed(42L)
    val model = gbt.fit(feats)
    model.transform(feats)
      .groupBy(col("blabel").cast("int").as("label"),
        col("prediction").cast("int").as("prediction"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "prediction")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "j12_geo_join" -> j12GeoJoin,
    "m23_normalizer" -> m23Normalizer,
    "m24_word2vec" -> m24Word2vec,
    "m25_gbt" -> m25Gbt)

  val oracleSql: Map[String, String] = Map(
    "j12_geo_join" ->
      s"""WITH c AS (
         |  SELECT c_custkey, ${latSql("c_custkey")} AS lat,
         |         ${lonSql("c_custkey")} AS lon FROM customer),
         |s AS (
         |  SELECT s_suppkey, ${latSql("s_suppkey")} AS lat,
         |         ${lonSql("s_suppkey")} AS lon FROM supplier)
         |SELECT s_suppkey, c_custkey,
         |  round(2 * 6371.0 * asin(sqrt(
         |    pow(sin(radians(c.lat - s.lat) / 2), 2) +
         |    cos(radians(s.lat)) * cos(radians(c.lat)) *
         |      pow(sin(radians(c.lon - s.lon) / 2), 2))), 4) AS dist_km
         |FROM s, c
         |WHERE 2 * 6371.0 * asin(sqrt(
         |    pow(sin(radians(c.lat - s.lat) / 2), 2) +
         |    cos(radians(s.lat)) * cos(radians(c.lat)) *
         |      pow(sin(radians(c.lon - s.lon) / 2), 2))) < 500
         |ORDER BY s_suppkey, c_custkey""".stripMargin,
    "m23_normalizer" ->
      """WITH v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
        |  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
        |                         CAST(embedding AS DOUBLE[])) > 0),
        |n AS (SELECT vec_id, x, sqrt(list_dot_product(x, x)) AS nrm FROM v)
        |SELECT vec_id,
        |  round(x[1] / nrm, 4) AS c0,
        |  round(x[2] / nrm, 4) AS c1,
        |  round(x[3] / nrm, 4) AS c2,
        |  CAST(len(list_filter(x, e -> round(e / nrm, 4) > 0.1)) AS INT) AS n_big
        |FROM n ORDER BY vec_id""".stripMargin)
}
