package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.CountVectorizer
import org.apache.spark.ml.regression.{GBTRegressor, RandomForestRegressor}

import graft.{Orc, Tables}
import graft.ml.Pipelines

/** Round-11 surface batch 1: the four VERDICT-r10 closure items —
  * CountVectorizer as its own oracle-checked registry row, the
  * regressor siblings of the tree ensembles (m12/m25 are
  * classifier-only), and one-level Louvain local-move community
  * detection (the optimizer for the modularity lg10 only SCORES).
  *
  * Contrast with near-siblings: m16 HashingTF hashes tokens into a
  * fixed space (no vocabulary, collisions allowed); m200 FITS an
  * explicit vocabulary (minDF=2) and counts against it — the
  * invertible variant a tokenizer-vocab pipeline needs. m12/m25
  * classify (confusion-matrix readout); m201/m202 regress (quantized
  * R² readout). lg5 label-prop adopts the most frequent neighbour
  * label; lg12 moves each vertex to the community with the largest
  * MODULARITY GAIN — it optimizes exactly the Q that lg10 reports, so
  * lg5→lg10→lg12 is find/score/improve over the same kNN graph.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.13 (feature transforms), §2.14 (MLlib parity), §2.9
  * (graph ops).
  */
object SurfaceR11a extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M200: CountVectorizer ----

  /** M200: COUNT VECTORIZER — fit an explicit vocabulary over the
    * document tokens (minDF = 2: a term must appear in ≥ 2 documents;
    * vocabSize left non-binding so the fitted set is deterministic),
    * then emit each document's term counts restricted to that
    * vocabulary. The registry row hash-checks the FIT: the emitted
    * (doc_id, term, tf) rows exist iff the fitted vocabulary kept the
    * term, and the oracle recomputes the same minDF filter
    * relationally. The model's vector-space transform and its
    * freq-desc index ordering are law-checked in SurfaceR11aSpec.
    *
    * Scale shape: the vocabulary is the MODEL (driver-held by MLlib
    * design, broadcast back for the join); the counts side is one
    * explode + hash agg keyed by (doc, term) — map-side combinable,
    * no all-pairs anywhere. At 100 TB the vocabulary stays bounded by
    * minDF/vocabSize while the counts scan streams.
    */
  val m200CountVectorizer: Q = (s, d) => {
    import s.implicits._
    val docs = documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val cv = new CountVectorizer().setInputCol("toks").setOutputCol("tf")
      .setMinDF(2.0).setVocabSize(1 << 18)
    val model = cv.fit(docs)
    // The oracle is a PURE minDF filter, which is only what MLlib fits
    // while vocabSize stays non-binding: at the cap MLlib truncates by
    // frequency and the row would diverge with no named failure mode.
    // Fail loudly at the boundary instead (ADVICE r11).
    require(model.vocabulary.length < (1 << 18),
      s"m200: fitted vocabulary (${model.vocabulary.length}) hit vocabSize " +
        "— the oracle models an uncapped minDF filter; raise the cap")
    val vocab = model.vocabulary.toSeq.toDF("term")
    docs.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .join(broadcast(vocab), "term")
      .select("doc_id", "term", "tf")
      .orderBy("doc_id", "term")
  }

  // ---- M201/M202: tree-ensemble regressors ----

  /** Shared fixture: embedding features with the class label recast as
    * a regression target — the regressor must recover the label-coded
    * structure the classifiers separate, making the R² law meaningful.
    */
  private def regFeatures(s: SparkSession, d: String): DataFrame =
    Pipelines.embeddingFeatures(embeddings(s, d))
      .withColumn("y", col("label"))

  /** Quantized per-label readout shared by m201/m202: predictions are
    * quantized to the 1e-4 grid BEFORE any sum (the m121 idiom — a
    * seeded fit is deterministic but float summation order is not), so
    * the per-label mean prediction and the global R² are exact-integer
    * reductions and the determinism double-drive sees identical bits.
    * Rows-checked (seeded model fit: declared no-oracle, like m4/m5);
    * the R² floor lives in SurfaceR11aSpec.
    */
  private def regReadout(scored: DataFrame): DataFrame = {
    val q = scored.select(col("y"),
      expr("CAST(floor(prediction * 10000 + 0.5) AS BIGINT)").as("pq"),
      expr("CAST(floor((prediction - y) * 10000 + 0.5) AS BIGINT)").as("eq"))
    val tot = q.agg(
      sum(col("eq") * col("eq")).as("ssr_q"),
      count(lit(1)).as("n"))
    q.groupBy(col("y").cast("long").as("label"))
      .agg(count(lit(1)).as("n_rows"),
        r4(sum(col("pq")).cast("double") / (count(lit(1)) * 10000L))
          .as("mean_pred"))
      .crossJoin(broadcast(tot.select(
        r4(col("ssr_q").cast("double") / (col("n") * lit(1e8)))
          .as("mse"))))
      .orderBy("label")
  }

  /** M201: RANDOM FOREST REGRESSOR — the regression sibling of m12's
    * RandomForestClassifier (VERDICT r10 gap #4): 20 seeded trees,
    * depth 5, on the 64-dim embeddings with the label-coded target.
    * Fit cost is the standard distributed histogram aggregation; the
    * transform is narrow. */
  val m201RfRegressor: Q = (s, d) => {
    val feats = regFeatures(s, d)
    val rf = new RandomForestRegressor().setLabelCol("y")
      .setFeaturesCol("features").setNumTrees(20).setMaxDepth(5)
      .setSeed(42L)
    regReadout(rf.fit(feats).transform(feats))
  }

  /** M202: GBT REGRESSOR — the boosted sibling (squared-error loss,
    * 10 seeded rounds, depth 3), completing the tabular-ML quartet
    * {RF, GBT} × {classify, regress}. */
  val m202GbtRegressor: Q = (s, d) => {
    val feats = regFeatures(s, d)
    val gbt = new GBTRegressor().setLabelCol("y")
      .setFeaturesCol("features").setMaxIter(10).setMaxDepth(3)
      .setSeed(42L)
    regReadout(gbt.fit(feats).transform(feats))
  }

  // ---- LG12: Louvain one-level local move ----

  /** Synchronous local-move sweeps; the oracle unrolls exactly this
    * many rounds. Shared with lg13's coarsened second level. */
  private[queries] val LV_ROUNDS = 3

  /** LG12: LOUVAIN ONE-LEVEL LOCAL MOVE — every vertex starts as its
    * own community; each synchronous round it moves to the candidate
    * community (neighbour communities ∪ its own) with the largest
    * modularity gain, ties → smallest community id. With unweighted
    * edges the gain comparison is EXACT INTEGER arithmetic: argmax_c
    * ΔQ(i→c) = argmax_c [2m·k_{i,c} − deg_i·(deg_c − [i∈c]·deg_i)]
    * (the 1/2m² scaling is monotone and drops out), so the sweep is
    * bit-deterministic and the DuckDB replay hash-matches — same
    * quantize-free flip as lg_pagerank/m95 this round. One level of
    * the full Louvain (no graph coarsening): the local-move phase is
    * where ~all the modularity is gained on sparse kNN graphs.
    *
    * Scale shape per round: one equi-join + hash agg for k_{i,c}
    * (keyed by vertex), one hash agg for community degrees, a
    * per-vertex argmax window (partitioned by vertex), one broadcast
    * scalar (2m); eager localCheckpoint pins constant plan depth.
    * Identical plan at a billion edges with pre-partitioned labels.
    */
  /** The level-1 label table (v, c) after LV_ROUNDS synchronous sweeps
    * — factored out so lg13's coarsening consumes the identical
    * computation lg12 reports. */
  private[queries] def louvainLabels(s: SparkSession, d: String): DataFrame = {
    val und = SurfaceR6h.knnEdges(s, d).localCheckpoint(true)
    val adj = und.union(und.select(col("t").as("s"), col("s").as("t")))
      .localCheckpoint(true)
    val deg = adj.groupBy(col("s").as("v")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val mrow = und.agg(count(lit(1)).as("m"))
    var lab = deg.select(col("v"), col("v").as("c"))
    val w = Window.partitionBy("v").orderBy(col("score").desc, col("c").asc)
    for (_ <- 1 to LV_ROUNDS) {
      val kic = adj
        .join(lab.select(col("v").as("t"), col("c")), "t")
        .groupBy(col("s").as("v"), col("c")).agg(count(lit(1)).as("k"))
      val dc = lab.join(deg, "v")
        .groupBy("c").agg(sum("deg").as("dc"))
      val cand = kic
        .unionByName(lab.select(col("v"), col("c"), lit(0L).as("k")))
        .groupBy("v", "c").agg(max("k").as("k"))
      lab = cand
        .join(dc, "c")
        .join(deg, "v")
        .join(lab.select(col("v"), col("c").as("cur")), "v")
        .crossJoin(broadcast(mrow))
        .select(col("v"), col("c"),
          expr("2 * m * k - deg * (dc - CASE WHEN c = cur THEN deg" +
            " ELSE CAST(0 AS BIGINT) END)").as("score"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("v"), col("c"))
        .localCheckpoint(true)
    }
    lab
  }

  val lg12Louvain: Q = (s, d) =>
    louvainLabels(s, d)
      .select(col("v").as("vec_id"), col("c").as("community"))
      .orderBy("vec_id")

  /** Unrolled Louvain local-move rounds for the oracle — the identical
    * integer gain ordering; MATERIALIZED because every round
    * re-references adj/dg/c_i several times (the lg8 OOM lesson). */
  private[queries] def lvRoundsSql(k: Int): String =
    (0 until k).map { i =>
      s"""kic$i AS MATERIALIZED (
         |  SELECT adj.s AS v, l.c, CAST(count(*) AS BIGINT) AS k
         |  FROM adj JOIN c$i l ON l.v = adj.t GROUP BY 1, 2),
         |dc$i AS MATERIALIZED (
         |  SELECT l.c, CAST(sum(dg.deg) AS BIGINT) AS dc
         |  FROM c$i l JOIN dg ON dg.v = l.v GROUP BY 1),
         |cand$i AS MATERIALIZED (
         |  SELECT v, c, max(k) AS k FROM (
         |    SELECT v, c, k FROM kic$i
         |    UNION ALL SELECT v, c, CAST(0 AS BIGINT) FROM c$i)
         |  GROUP BY 1, 2),
         |sc$i AS MATERIALIZED (
         |  SELECT cand.v, cand.c,
         |    2 * mm.m * cand.k - dg.deg *
         |      (dc.dc - CASE WHEN cand.c = cur.c THEN dg.deg
         |                    ELSE CAST(0 AS BIGINT) END) AS score
         |  FROM cand$i cand
         |  JOIN dg ON dg.v = cand.v
         |  JOIN dc$i dc ON dc.c = cand.c
         |  JOIN c$i cur ON cur.v = cand.v
         |  CROSS JOIN mm),
         |c${i + 1} AS MATERIALIZED (
         |  SELECT v, c FROM (
         |    SELECT v, c, row_number() OVER (
         |      PARTITION BY v ORDER BY score DESC, c) AS rn
         |    FROM sc$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  /** The shared WITH-clause prefix: edges, symmetric adjacency,
    * degrees, 2m, singleton seed labels, and LV_ROUNDS unrolled sweeps
    * ending in c{LV_ROUNDS}. lg13's oracle extends this same text with
    * the coarsened level. */
  private[queries] def louvainCtePrefix: String = {
    val edges = SurfaceR6h.knnEdgesCte
      .replace("e AS (", "e AS MATERIALIZED (")
    s"""$edges,
       |adj AS MATERIALIZED (SELECT s, t FROM e UNION ALL SELECT t, s FROM e),
       |dg AS MATERIALIZED (
       |  SELECT s AS v, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
       |mm AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
       |c0 AS MATERIALIZED (SELECT v, v AS c FROM dg),
       |${lvRoundsSql(LV_ROUNDS)}""".stripMargin
  }

  private def louvainSql: String =
    s"""WITH $louvainCtePrefix
       |SELECT v AS vec_id, c AS community FROM c$LV_ROUNDS
       |ORDER BY vec_id""".stripMargin

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m200_count_vectorizer" -> m200CountVectorizer,
    "m201_rf_regressor" -> m201RfRegressor,
    "m202_gbt_regressor" -> m202GbtRegressor,
    "lg12_louvain" -> lg12Louvain)

  val oracleSql: Map[String, String] = Map(
    // m201/m202 intentionally absent: seeded model fits (declared
    // no-oracle, the m4/m5 pattern); laws in SurfaceR11aSpec
    "m200_count_vectorizer" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |df AS (
        |  SELECT term, count(DISTINCT doc_id) AS ndocs
        |  FROM toks GROUP BY 1),
        |vocab AS (SELECT term FROM df WHERE ndocs >= 2),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY 1, 2)
        |SELECT t.doc_id, t.term, t.tf
        |FROM tf t JOIN vocab USING (term)
        |ORDER BY doc_id, term""".stripMargin,
    "lg12_louvain" -> louvainSql)
}
