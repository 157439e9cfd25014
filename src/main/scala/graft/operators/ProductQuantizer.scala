package graft.operators

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Product quantization (PQ) ANN — the MEMORY-side scale path for
  * embedding search, complementing IVF (the COMPUTE-side path in
  * [[Similarity]]).
  *
  * At 100 TB the corpus embeddings do not fit in cluster memory as
  * float32: 1 B × 64-dim vectors = 256 GB raw. PQ splits each vector
  * into `m` subvectors, k-means-quantizes each subspace to `ksub`
  * centroids, and stores only the per-subspace code (m bytes with
  * ksub ≤ 256) — 16–64× compression against 64-dim float32 (defaults
  * m=8/ksub=32: 16×), turning the scan side of ANN into a code-table
  * read. Recall rises with m (more additive terms) and ksub (finer
  * cells); production systems often re-rank an ADC shortlist with
  * exact distances — compose [[pqTopK]] (k′ > k) with
  * [[Similarity.bruteForceTopK]] on the shortlist for that shape.
  * Queries never decode: asymmetric distance computation (ADC) scores
  * a candidate as the SUM of per-subspace distances between the exact
  * query subvector and the candidate's sub-centroid, looked up from a
  * per-query table of m·ksub precomputed entries (Jégou et al.,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011).
  *
  * Spark shape (all declarative, no UDFs):
  *  - training: m seeded KMeans fits on slice() projections — at scale
  *    on a `fitSampleFraction` sample; the driver holds only m·ksub
  *    centroids;
  *  - encoding: one narrow projection per (vector, subspace) row
  *    against the literal codebook (argmin over ksub entries via
  *    array_sort of a transform — codegen'd, no join, no shuffle);
  *  - ADC: the per-query LUT is a generated relation (q, sub, code, d)
  *    broadcast-joined to the code table, then one partial-aggregated
  *    sum and the bounded-heap top-k — the only shuffle carries ≤ k
  *    entries per query per map task.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.10 (similarity search scale paths).
  */
object ProductQuantizer {

  /** Train codebooks and encode `corpus`: one row per (id, sub, code).
    * Returned with the codebook literal column expression for reuse.
    */
  private def train(
      corpus: DataFrame,
      m: Int,
      ksub: Int,
      dim: Int,
      embCol: String,
      idCol: String,
      seed: Long,
      fitSampleFraction: Double): (DataFrame, org.apache.spark.sql.Column) = {
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val base = corpus.select(col(idCol).as("c_id"), col(embCol).as("emb"))
    val fitInput = (if (fitSampleFraction < 1.0)
      base.sample(withReplacement = false, fitSampleFraction, seed) else base)
      .select(col("emb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // m independent sub-quantizers; each fit sees only its dsub slice.
    // The m-iteration driver loop is bounded by the constant m, not
    // data. The fits run CONCURRENTLY (independent seeds, results
    // order-independent): each KMeans underutilizes the cluster during
    // its driver-side reseed/convergence steps, and m concurrent jobs
    // fill those gaps — the fair scheduler interleaves them. The shared
    // fit input is persisted once above so the m fits re-slice cached
    // rows instead of re-scanning parquet m times. `.par` runs on
    // ForkJoinPool common-pool threads that do NOT inherit the caller's
    // job group, so each task re-applies it via the runner — otherwise
    // QueryGuard's cancelJobGroup could not kill a wedged fit.
    import scala.collection.parallel.CollectionConverters._
    val jobGroup = graft.QueryGuard.withCallerJobGroup(corpus.sparkSession.sparkContext)
    val codebooks: Map[Int, Seq[(Int, Seq[Float], Double)]] =
      (0 until m).par.map { j => jobGroup {
        val feats = fitInput.select(
          array_to_vector(slice(col("emb"), j * dsub + 1, dsub)).as("features"))
        val km = new org.apache.spark.ml.clustering.KMeans()
          .setK(ksub).setSeed(seed + j).setFeaturesCol("features")
        val model = km.fit(feats)
        j -> model.clusterCenters.zipWithIndex.map { case (c, i) =>
          val arr = c.toArray.map(_.toFloat)
          (i, arr.toSeq, arr.map(x => x.toDouble * x).sum)
        }.toSeq
      } }.seq.toMap
    fitInput.unpersist(blocking = false)
    val cbCol = typedlit(codebooks)

    // encode: (id, sub, subvec) → argmin_code ||subvec − c||². The
    // row-constant ||subvec||² term is dropped (argmin-invariant), so
    // the scored quantity is ||c||² − 2·subvec·c — one transform over
    // ksub literal entries, ties broken by code for determinism.
    val subArr = array((0 until m).map(j => slice(col("emb"), j * dsub + 1, dsub)): _*)
    val codes = base
      .select(col("c_id"), posexplode(subArr).as(Seq("sub", "subvec")))
      .withColumn("best",
        array_sort(transform(element_at(cbCol, col("sub")), c =>
          struct(
            (c.getField("_3") - dotProduct(col("subvec"), c.getField("_2")) * 2).as("d2"),
            c.getField("_1").as("code"))))
          .getItem(0))
      .select(col("c_id"), col("sub"), col("best.code").as("code"))
    (codes, cbCol)
  }

  /** PQ-ADC top-k by (approximate) L2 over raw vectors: for each query,
    * the k corpus ids with the smallest summed sub-distances. Distances
    * per (query, sub, code) carry the query's own ||q_sub||² term
    * dropped (rank-invariant per query), so `adist` is comparable
    * WITHIN a query only — exactly what top-k needs.
    */
  def pqTopK(
      queries: DataFrame,  // (idCol, embCol)
      corpus: DataFrame,   // (idCol, embCol)
      k: Int,
      m: Int = 8,
      ksub: Int = 32,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      seed: Long = 42L,
      fitSampleFraction: Double = 1.0): DataFrame = {
    // dim discovery: one 1-row job, schema-level work — not a data loop
    val dim = corpus.select(size(col(embCol))).head().getInt(0)
    val dsub = dim / m
    val (codes, cbCol) = train(corpus, m, ksub, dim, embCol, idCol, seed, fitSampleFraction)

    // per-query LUT: (q_id, sub, code, d) — m·ksub rows per query;
    // broadcast because the query batch is the small side by contract
    // (at scale, queries stream through in bounded batches)
    val qSubArr = array((0 until m).map(j => slice(col("emb"), j * dsub + 1, dsub)): _*)
    val lut = queries
      .select(col(idCol).as("q_id"), col(embCol).as("emb"))
      .select(col("q_id"), posexplode(qSubArr).as(Seq("sub", "qsub")))
      .select(col("q_id"), col("sub"),
        explode(transform(element_at(cbCol, col("sub")), c =>
          struct(c.getField("_1").as("code"),
            (c.getField("_3") - dotProduct(col("qsub"), c.getField("_2")) * 2).as("d"))))
          .as("e"))
      .select(col("q_id"), col("sub"), col("e.code").as("code"), col("e.d").as("d"))

    // ADC: code-table ⋈ LUT on (sub, code), partial-agg the m-term sum,
    // bounded-heap top-k (score = −distance so the heap keeps nearest);
    // self-matches excluded to mirror the brute-force baseline
    codes.join(broadcast(lut), Seq("sub", "code"))
      .where(col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id")
      .agg(sum("d").as("adist"))
      .groupBy("q_id")
      .agg(org.apache.spark.sql.graft.TopKByScore.topK(
        -col("adist"), col("c_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.tie").as("c_id"),
        (col("pos") + 1).as("rn"), (-col("e.score")).as("adist"))
  }

  /** PQ-ADC shortlist + exact re-rank — the production ANN shape
    * (IVFADC papers call it re-ranking; vector stores call it refine).
    * The compressed codes cut the candidate set from n to `shortlist`
    * per query; only those ≤ shortlist rows per query touch the raw
    * vectors, via an equi-join on c_id — so the expensive exact kernel
    * runs on a candidate-bounded relation, never on the corpus. Recall
    * is the probability the true neighbours survive the ADC cut (rises
    * with shortlist/k); ranking among survivors is exact cosine. */
  def pqTopKRerank(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      shortlist: Int = 50,
      m: Int = 8,
      ksub: Int = 32,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      seed: Long = 42L,
      fitSampleFraction: Double = 1.0): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val cand = pqTopK(queries, corpus, shortlist, m, ksub, idCol, embCol,
      seed, fitSampleFraction)
      .select(col("q_id"), col("c_id"))
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
    val c = corpus.select(col(idCol).as("c_id"), col(embCol).as("c_emb"))
    cand.join(q, "q_id").join(c, "c_id")
      .select(col("q_id"), col("c_id"),
        cosineSim(col("q_emb"), col("c_emb")).as("cos"))
      .groupBy("q_id")
      .agg(org.apache.spark.sql.graft.TopKByScore.topK(col("cos"), col("c_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.tie").as("c_id"), col("e.score").as("cos"),
        (col("pos") + 1).as("rn"))
  }

  /** The encoded corpus alone — (id, sub, code) with code < ksub — for
    * storage-layer use and the compression-accounting spec. */
  def encode(
      corpus: DataFrame,
      m: Int = 4,
      ksub: Int = 16,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      seed: Long = 42L,
      fitSampleFraction: Double = 1.0): DataFrame = {
    val dim = corpus.select(size(col(embCol))).head().getInt(0)
    train(corpus, m, ksub, dim, embCol, idCol, seed, fitSampleFraction)._1
  }

  /** Coarse-quantizer fit for the inverted file: nlist (cell, centroid,
    * ||centroid||²) triples — index metadata that lives driver-side. */
  private def coarseFit(
      base: DataFrame, // (c_id, emb)
      nlist: Int,
      seed: Long,
      fitSampleFraction: Double): Seq[(Int, Seq[Float], Double)] = {
    val fitInput = if (fitSampleFraction < 1.0)
      base.sample(withReplacement = false, fitSampleFraction, seed) else base
    val coarse = new org.apache.spark.ml.clustering.KMeans()
      .setK(nlist).setSeed(seed + 1000).setFeaturesCol("features")
      .fit(fitInput.select(
        org.apache.spark.ml.functions.array_to_vector(col("emb")).as("features")))
    coarse.clusterCenters.zipWithIndex.map { case (c, i) =>
      val arr = c.toArray.map(_.toFloat)
      (i, arr.toSeq, arr.map(x => x.toDouble * x).sum)
    }.toSeq
  }

  /** Nearest-cell ranking as column algebra over the literal centroids:
    * argsort by ||c||² − 2·v·c (the ||v||² term is rank-invariant). */
  private def cellRanked(cents: Seq[(Int, Seq[Float], Double)])(
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    array_sort(transform(typedlit(cents), c =>
      struct((c.getField("_3") - dotProduct(v, c.getField("_2")) * 2).as("d2"),
        c.getField("_1").as("cell"))))

  /** The inverted-file stage of [[ivfPqTopK]] alone: (q_id, c_id, cell)
    * candidate pairs from probing `nprobe` of `nlist` coarse cells —
    * exposed so the pruning ratio is testable/observable on its own.
    * `cell` is the CANDIDATE's cell (each corpus vector has exactly
    * one, so (q_id, c_id) pairs are unique). */
  private[graft] def ivfCandidates(
      queries: DataFrame,
      corpus: DataFrame,
      nlist: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      seed: Long = 42L,
      fitSampleFraction: Double = 1.0): DataFrame = {
    val base = corpus.select(col(idCol).as("c_id"), col(embCol).as("emb"))
    val ranked = cellRanked(coarseFit(base, nlist, seed, fitSampleFraction)) _
    val assigned = base.select(col("c_id"),
      ranked(col("emb")).getItem(0).getField("cell").as("cell"))
    val probes = queries
      .select(col(idCol).as("q_id"), col(embCol).as("emb"))
      .select(col("q_id"),
        explode(slice(transform(ranked(col("emb")), s => s.getField("cell")),
          1, nprobe)).as("cell"))
    probes.join(assigned, "cell").where(col("q_id") =!= col("c_id"))
      .select("q_id", "c_id", "cell")
  }

  /** IVF-PQ — the full IVFADC composition (coarse inverted file +
    * product-quantized RESIDUAL scoring + exact re-rank), the
    * architecture behind FAISS-style billion-vector indexes (Jégou et
    * al., TPAMI 2011, §IV): a KMeans coarse quantizer assigns every
    * corpus vector to one of `nlist` cells; PQ codebooks quantize the
    * RESIDUAL v − centroid(cell(v)) — residuals are small, so the same
    * ksub cells cover them far more finely than the raw space; each
    * query probes its `nprobe` nearest cells and scores candidates by
    * ADC against a per-(query, probed-cell) LUT of residual distances
    * (nprobe·m·ksub rows per query — still broadcast-sized); the ADC
    * shortlist is exact-re-ranked. Candidates shrink ~nprobe/nlist on
    * top of the 16× code compression, and only the shortlist touches
    * raw vectors. Probe selection and cell assignment are narrow
    * projections against the literal centroid array — no centroid
    * join, no extra shuffle. */
  def ivfPqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      shortlist: Int = 50,
      m: Int = 8,
      ksub: Int = 32,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      seed: Long = 42L,
      fitSampleFraction: Double = 1.0): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val dim = corpus.select(size(col(embCol))).head().getInt(0)
    val dsub = dim / m

    val base = corpus.select(col(idCol).as("c_id"), col(embCol).as("emb"))
    val cents = coarseFit(base, nlist, seed, fitSampleFraction)
    val ranked = cellRanked(cents) _
    val cellMap = typedlit(cents.map(t => t._1 -> t._2).toMap)

    // corpus side: cell + residual; PQ is trained and encoded on the
    // residual space (same train() machinery, residual as the "vector")
    val assigned = base
      .withColumn("cell", ranked(col("emb")).getItem(0).getField("cell"))
      .withColumn("resid",
        zip_with(col("emb"), element_at(cellMap, col("cell")), (a, b) => a - b))
    val (codes, cbCol) = train(
      assigned.select(col("c_id"), col("resid")), m, ksub, dim, "resid", "c_id",
      seed, fitSampleFraction)
    val cells = assigned.select("c_id", "cell")

    // query side: nprobe probed cells, one residual PER probed cell,
    // LUT keyed by (q_id, cell, sub, code) — nprobe·m·ksub rows/query
    val probes = queries
      .select(col(idCol).as("q_id"), col(embCol).as("emb"))
      .select(col("q_id"), col("emb"),
        explode(slice(transform(ranked(col("emb")), s => s.getField("cell")),
          1, nprobe)).as("cell"))
      .withColumn("qres",
        zip_with(col("emb"), element_at(cellMap, col("cell")), (a, b) => a - b))
    val qSubArr = array((0 until m).map(j => slice(col("qres"), j * dsub + 1, dsub)): _*)
    val lut = probes
      .select(col("q_id"), col("cell"), posexplode(qSubArr).as(Seq("sub", "qsub")))
      .select(col("q_id"), col("cell"), col("sub"),
        explode(transform(element_at(cbCol, col("sub")), c =>
          struct(c.getField("_1").as("code"),
            (c.getField("_3") - dotProduct(col("qsub"), c.getField("_2")) * 2).as("d"))))
          .as("e"))
      .select(col("q_id"), col("cell"), col("sub"),
        col("e.code").as("code"), col("e.d").as("d"))

    // ADC: codes of probed-cell candidates ⋈ the residual LUT on
    // (q_id, cell, sub, code) — the cell key picks the right residual
    // table; then the m-term sum and the bounded heap as in pqTopK
    val adc = codes.join(cells, "c_id")
      .join(broadcast(lut), Seq("cell", "sub", "code"))
      .where(col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id")
      .agg(sum("d").as("adist"))
      .groupBy("q_id")
      .agg(org.apache.spark.sql.graft.TopKByScore.topK(
        -col("adist"), col("c_id"), shortlist).as("top"))
      .select(col("q_id"), explode(col("top")).as("e"))
      .select(col("q_id"), col("e.tie").as("c_id"))

    // exact re-rank of the per-query shortlist
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
    val c = corpus.select(col(idCol).as("c_id"), col(embCol).as("c_emb"))
    adc.join(q, "q_id").join(c, "c_id")
      .select(col("q_id"), col("c_id"),
        cosineSim(col("q_emb"), col("c_emb")).as("cos"))
      .groupBy("q_id")
      .agg(org.apache.spark.sql.graft.TopKByScore.topK(col("cos"), col("c_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.tie").as("c_id"), col("e.score").as("cos"),
        (col("pos") + 1).as("rn"))
  }

  // ---- index lifecycle: build once, persist, query many ----
  //
  // At 100 TB the index is NOT rebuilt per query batch: codebooks are
  // trained once (on a sample), the corpus is encoded once, and both
  // land in storage; every subsequent query batch reads the tiny
  // codebook (m·ksub rows), builds its LUT against it, and joins the
  // code table — no KMeans, no touch of the raw vectors except for the
  // shortlist re-rank.

  /** Build and persist the index: `path/codes` = (c_id, sub, code)
    * parquet, `path/codebook` = (sub, code, centroid, cnorm2) parquet. */
  def saveIndex(
      corpus: DataFrame,
      path: String,
      m: Int = 8,
      ksub: Int = 32,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      seed: Long = 42L,
      fitSampleFraction: Double = 1.0): Unit = {
    val spark = corpus.sparkSession
    val dim = corpus.select(size(col(embCol))).head().getInt(0)
    val (codes, cbCol) = train(corpus, m, ksub, dim, embCol, idCol, seed, fitSampleFraction)
    codes.write.mode("overwrite").parquet(s"$path/codes")
    cbRows(cbCol, spark).write.mode("overwrite").parquet(s"$path/codebook")
  }

  /** The codebook literal column rendered as a DataFrame (sub, code,
    * centroid, cnorm2) — m·ksub rows of index metadata. */
  private def cbRows(cbCol: org.apache.spark.sql.Column,
      spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.range(1)
      .select(explode(map_entries(cbCol)).as("e"))
      .select(col("e.key").as("sub"), explode(col("e.value")).as("c"))
      .select(col("sub"), col("c._1").as("code"),
        col("c._2").as("centroid"), col("c._3").as("cnorm2"))

  /** Append NEW vectors to a persisted index: encode them against the
    * STORED codebook (broadcast join + per-(id, sub) argmin — no refit,
    * no touch of existing codes) and append to `path/codes`. This is
    * the daily-ingest path: codebooks are fit rarely (quantizer drift
    * is slow), encode cost is one narrow pass over the new batch, and
    * the code table only ever grows by appended files. Ties in the
    * argmin break by code, matching the literal-codebook encoder
    * exactly (asserted by SurfaceR8Spec). */
  def appendToIndex(
      newVectors: DataFrame,
      path: String,
      idCol: String = "vec_id",
      embCol: String = "embedding"): Unit = {
    val spark = newVectors.sparkSession
    val cb = spark.read.parquet(s"$path/codebook")
    val m = cb.agg(countDistinct(col("sub"))).head().getLong(0).toInt
    val dim = newVectors.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by stored m=$m")
    val dsub = dim / m
    val subArr = array((0 until m).map(j => slice(col("emb"), j * dsub + 1, dsub)): _*)
    newVectors
      .select(col(idCol).as("c_id"), col(embCol).as("emb"))
      .select(col("c_id"), posexplode(subArr).as(Seq("sub", "subvec")))
      .join(broadcast(cb), "sub")
      .select(col("c_id"), col("sub"),
        struct((col("cnorm2") - dotProduct(col("subvec"), col("centroid")) * 2).as("d2"),
          col("code").as("code")).as("cand"))
      .groupBy("c_id", "sub")
      .agg(min(col("cand")).getField("code").as("code"))
      .write.mode("append").parquet(s"$path/codes")
  }

  /** Query a persisted index: LUT from the stored codebook (broadcast
    * join — no literal, no refit), ADC over the stored code table,
    * bounded-heap top-k. Same ranking semantics as [[pqTopK]]. */
  def topKFromIndex(
      queries: DataFrame,
      path: String,
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val codes = spark.read.parquet(s"$path/codes")
    val cb = spark.read.parquet(s"$path/codebook")
    val m = cb.agg(countDistinct(col("sub"))).head().getLong(0).toInt
    val dim = queries.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by stored m=$m")
    val dsub = dim / m
    val qSubArr = array((0 until m).map(j => slice(col("emb"), j * dsub + 1, dsub)): _*)
    val qsubs = queries
      .select(col(idCol).as("q_id"), col(embCol).as("emb"))
      .select(col("q_id"), posexplode(qSubArr).as(Seq("sub", "qsub")))
    val lut = qsubs.join(broadcast(cb), "sub")
      .select(col("q_id"), col("sub"), col("code"),
        (col("cnorm2") - dotProduct(col("qsub"), col("centroid")) * 2).as("d"))
    codes.join(broadcast(lut), Seq("sub", "code"))
      .where(col("q_id") =!= col("c_id"))
      .groupBy("q_id", "c_id")
      .agg(sum("d").as("adist"))
      .groupBy("q_id")
      .agg(org.apache.spark.sql.graft.TopKByScore.topK(
        -col("adist"), col("c_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("q_id"), col("e.tie").as("c_id"),
        (col("pos") + 1).as("rn"), (-col("e.score")).as("adist"))
  }
}
