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
    // spread the streamed side over the cluster before the nested-loop
    // join: pair-scan work is ∝ |q|·|c|, not bytes, so byte-sized scan
    // splits under-provision it (a small parquet file = ONE task running
    // the whole quadratic loop). Explicit numPartitions survives AQE
    // coalescing and scales with cores.
    val spread = queries.sparkSession.sparkContext.defaultParallelism
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .repartition(spread)
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
    // streamed-side spread: same rationale as bruteForceTopK
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .repartition(queries.sparkSession.sparkContext.defaultParallelism)
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
      seed: Long = 42L,
      fitSampleFraction: Double = 1.0): DataFrame = {
    val spark = df.sparkSession
    val feats = df.select(
      col(idCol).as("id"), col(embCol).as("emb"),
      array_to_vector(col(embCol)).as("features"))
    // quantizer trains on a seeded sample at scale (recall depends on
    // nprobe, not centroid optimality); assignment is one full pass
    val fitInput = if (fitSampleFraction < 1.0)
      feats.sample(withReplacement = false, fitSampleFraction, seed) else feats
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(nlist).setSeed(seed).setFeaturesCol("features")
    val model = km.fit(fitInput)
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

  /** L4 primary at-scale route — IVF-bucketed top-k with the bounded-heap
    * aggregate. Combines the three scale fixes in one shape:
    *   - candidate generation is an equi-join on `cell` (hash-partitioned,
    *     AQE-skew-splittable) — no broadcast of the corpus, no
    *     BroadcastNestedLoopJoin (asserted by PlanSpec);
    *   - probe selection is ONE narrow projection against a literal
    *     centroid array (nlist rows live driver-side after the KMeans
    *     fit) — no centroid join, no per-vector window, zero extra
    *     shuffles;
    *   - the top-k reduction is the map-side bounded-heap
    *     TypedImperativeAggregate — the shuffle after scoring carries at
    *     most k entries per query per map task.
    * With `nprobe = nlist` every cell is probed, so the result is EXACT
    * (hash-checkable against the brute-force oracle) while the plan keeps
    * the bucketed shape; at scale set nprobe << nlist ≈ sqrt(n) to trade
    * recall for a ~nlist/nprobe candidate reduction, and fitSampleFraction
    * so the quantizer fit stays O(sample). */
  def ivfTopKAgg(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nlist: Int = 8,
      nprobe: Int = 8,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      seed: Long = 42L,
      fitSampleFraction: Double = 1.0): DataFrame = {
    val feats = corpus
      .select(col(idCol).as("c_id"), col(embCol).as("c_emb"))
      .withColumn("features", array_to_vector(col("c_emb")))
    val fitInput = if (fitSampleFraction < 1.0)
      feats.sample(withReplacement = false, fitSampleFraction, seed) else feats
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(nlist).setSeed(seed).setFeaturesCol("features")
    val model = km.fit(fitInput)
    val assigned = model.transform(feats)
      .select(col("c_id"), col("c_emb"), col("prediction").as("cell"))

    // (cell, centroid, ||centroid||²) as a literal array: probe ranking is
    // d²(q, c_j) = q·q - 2 q·c_j + ||c_j||², sorted in-row — no join.
    val cents: Seq[(Int, Seq[Float], Double)] =
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        val arr = c.toArray.map(_.toFloat)
        (i, arr.toSeq, arr.map(x => x.toDouble * x).sum)
      }.toSeq
    val centCol = typedlit(cents)

    val probes = queries
      .select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .withColumn("_self", dotProduct(col("q_emb"), col("q_emb")))
      .withColumn("ds", array_sort(transform(centCol, c =>
        struct(
          (col("_self") - dotProduct(col("q_emb"), c.getField("_2")) * 2 +
            c.getField("_3")).as("d2"),
          c.getField("_1").as("pcell")))))
      .withColumn("probe", explode(slice(col("ds"), 1, nprobe)))
      .select(col("q_id"), col("q_emb"), col("probe.pcell").as("cell"))

    probes.join(assigned, Seq("cell"))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosineSim(col("q_emb"), col("c_emb")).as("cos"))
      .groupBy("q_id")
      .agg(org.apache.spark.sql.graft.TopKByScore.topK(col("cos"), col("c_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.tie").as("c_id"), col("e.score").as("cos"),
        (col("pos") + 1).as("rn"))
  }

  /** Exact cosine near-dup pairs at scale — IVF cells + triangle-
    * inequality multiprobe, recall 1.0 by construction.
    *
    * A KMeans coarse quantizer over the UNIT-normalised vectors assigns
    * each vector one cell. `cos(a,b) >= t` on unit vectors means
    * `||a-b|| <= r` with `r = sqrt(2 - 2t)`; if b sits in cell j then by
    * the triangle inequality `d(a, c_j) <= d(a,b) + d(b, c_j)
    * <= r + (d(a, c_nearest(a)) + r)` (b's own assignment is no farther
    * than a's nearest centroid plus `d(a,b)`). So probing every cell
    * within `d_min(a) + 2r (+ eps)` of each vector a covers EVERY
    * candidate pair — unlike random-projection LSH there is no missed-
    * bucket failure mode, which is what lets the exact-dedup oracle pass
    * unchanged. Candidates then go through the same codegen cosine
    * kernel on the ORIGINAL vectors as the brute-force route, so the
    * surviving pair set is bit-identical to all-pairs.
    *
    * Scale posture: the candidate join is a plain equi-join on `cell`
    * (hash-partitionable, AQE-skew-splittable) — never a broadcast
    * nested-loop. Pair volume is bucket-occupancy-driven: clustered
    * real-world embeddings prune hard; adversarially uniform vectors
    * degrade toward all-pairs but through a shuffled hash join, never
    * an O(n²) driver or broadcast loop. `eps` absorbs float-32
    * normalisation error so pruning can never cost recall.
    *
    * Sizing `nlist`: the join's parallelism and per-task pair volume are
    * both cell-driven, so nlist must GROW with the corpus — the IVF rule
    * of thumb nlist ≈ sqrt(n) keeps expected occupancy ≈ sqrt(n) and
    * per-cell pair work ≈ n, i.e. linear total work when probes stay
    * O(1); pair it with `fitSampleFraction` so the quantizer fit stays
    * cheap. The fixture default 8 is for 500–2000-vector test data. */
  def exactNearDupPairs(
      df: DataFrame,
      threshold: Double,
      nlist: Int = 8,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      seed: Long = 42L,
      eps: Double = 1e-4,
      fitSampleFraction: Double = 1.0): DataFrame = {
    val spark = df.sparkSession
    val r = math.sqrt(math.max(0.0, 2.0 - 2.0 * threshold))

    // unit-normalise (float32 — the kernels are array<float>); zero-norm
    // vectors cannot clear a positive cosine threshold and are excluded
    // from pair generation, matching the brute-force predicate.
    val normed = df
      .select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("_norm", l2Norm(col("emb")))
      .where(col("_norm") > 0)
      .withColumn("nemb", expr("transform(emb, x -> cast(x / _norm as float))"))

    // The recall-1.0 guarantee holds for ANY centroid set (the probe
    // bound is triangle-inequality, not quality-dependent) — centroid
    // quality only affects PRUNING efficiency. So at scale the iterative
    // KMeans fit runs on a seeded sample; assignment still spans the
    // full data in one pass.
    val fitInput = (if (fitSampleFraction < 1.0)
      normed.sample(withReplacement = false, fitSampleFraction, seed)
    else normed).select(array_to_vector(col("nemb")).as("features"))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(nlist).setSeed(seed).setFeaturesCol("features")
    val model = km.fit(fitInput)
    val assigned = model
      .transform(normed.withColumn("features", array_to_vector(col("nemb"))))
      .select(col("id"), col("emb"), col("nemb"), col("prediction").as("cell"))

    // The centroid table is driver-side already (nlist rows) — embed it
    // as a literal array<struct> and compute every probe decision in ONE
    // narrow projection: no centroid join, no per-vector window, zero
    // extra shuffles. (cell, centroid, ||centroid||²) per entry.
    val cents: Seq[(Int, Seq[Float], Double)] =
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        val arr = c.toArray.map(_.toFloat)
        (i, arr.toSeq, arr.map(x => x.toDouble * x).sum)
      }.toSeq
    val centCol = typedlit(cents)

    val probes = assigned
      .withColumn("_self", dotProduct(col("nemb"), col("nemb")))
      .withColumn("ds", transform(centCol, c =>
        struct(
          c.getField("_1").as("pcell"),
          sqrt(greatest(lit(0.0),
            col("_self") - dotProduct(col("nemb"), c.getField("_2")) * 2 +
              c.getField("_3"))).as("d"))))
      .withColumn("d_min", array_min(transform(col("ds"), x => x.getField("d"))))
      .withColumn("probe",
        explode(filter(col("ds"),
          x => x.getField("d") <= col("d_min") + lit(2 * r + eps))))
      .select(col("id").as("a_id"), col("emb").as("a_emb"),
        col("probe.pcell").as("cell"))

    // equi-join on cell; each (a<b) pair appears exactly once because b
    // has exactly one cell and a provably probes it
    probes
      .join(assigned.select(col("id").as("b_id"), col("emb").as("b_emb"),
        col("cell")), Seq("cell"))
      .where(col("a_id") < col("b_id"))
      .withColumn("cos", cosineSim(col("a_emb"), col("b_emb")))
      .where(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos"))
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
