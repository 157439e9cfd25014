package graft.queries

import org.apache.spark.ml.classification.{LogisticRegression, OneVsRest}
import org.apache.spark.sql.expressions.Window
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
object SurfaceR9 extends QueryBatch {
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
    * (m4 shape). Accuracy-beats-majority is MlSpec's law.
    *
    * The fitted model round-trips through save/load before transform:
    * each inner LogisticRegressionModel retains a trainingSummary whose
    * SparkSession reference is not task-serializable (its
    * ObservationManager fails closure serialization under concurrent
    * drives), and persistence is the supported way to strip summaries
    * — it also exercises the OvR persistence path for free. */
  val m37Onevsrest: Q = (s, d) => {
    val feats = Pipelines.embeddingFeatures(embeddings(s, d))
    val ovr = new OneVsRest()
      .setClassifier(new LogisticRegression().setMaxIter(20).setRegParam(0.01))
      .setFeaturesCol("features").setLabelCol("label")
    val fitted = ovr.fit(feats)
    val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_m37_ovr_${java.util.UUID.randomUUID().toString.take(8)}")
    fitted.write.overwrite().save(dir.toString)
    graft.QueryGuard.deleteRecOnExit(dir.toFile)
    val loaded = org.apache.spark.ml.classification.OneVsRestModel.load(dir.toString)
    loaded.transform(feats)
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

  /** Shared basket frame for m41/m42: which event types co-occur within
    * a (user, day) session-ish window. The basket id is synthetic
    * (user_id·10⁵ + day-of-year) purely to group; FP-Growth sees only
    * the item arrays. Collect_set is bounded by the 5-value event-type
    * vocabulary, so baskets can never blow up the FP-tree. */
  private def eventBaskets(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select((col("user_id") * 100000L +
        dayofyear(col("ts")).cast("long")).as("bid"), col("event_type"))
      .distinct()
      .groupBy("bid").agg(collect_set("event_type").as("items"))

  /** M41: FP-Growth frequent itemsets over (user, day) behaviour
    * baskets — the distributed market-basket miner (conditional
    * FP-trees per suffix, no candidate generation). minSupport 0.1
    * splits the lattice cleanly at every SF (all 5 singletons and all
    * 10 pairs ≥ ~1.4× threshold, every triple ≤ ~0.55×), and the
    * output is capped at size ≤ 2 so the DuckDB oracle is closed-form
    * (group-by for singletons, basket self-join for pairs — an
    * any-size oracle would need recursive enumeration). Freq counts
    * are exact integers; items render as a sorted CSV key. */
  val m41Fpgrowth: Q = (s, d) => {
    val fp = new org.apache.spark.ml.fpm.FPGrowth()
      .setItemsCol("items").setMinSupport(0.1).setMinConfidence(0.25)
    fp.fit(eventBaskets(s, d)).freqItemsets
      .where(size(col("items")) <= 2)
      .select(size(col("items")).as("sz"),
        concat_ws(",", sort_array(col("items"))).as("items_str"),
        col("freq"))
      .orderBy("sz", "items_str")
  }

  /** M42: association rules from the m41 lattice — X→Y for frequent
    * pairs, with exact-integer-derived confidence/lift/support
    * (rounded at the edge). The oracle recomputes all three from the
    * same basket counts. */
  val m42AssocRules: Q = (s, d) => {
    val fp = new org.apache.spark.ml.fpm.FPGrowth()
      .setItemsCol("items").setMinSupport(0.1).setMinConfidence(0.25)
    fp.fit(eventBaskets(s, d)).associationRules
      .where(size(col("antecedent")) === 1 && size(col("consequent")) === 1)
      .select(element_at(col("antecedent"), 1).as("ant"),
        element_at(col("consequent"), 1).as("cons"),
        r4(col("confidence")).as("conf4"),
        r4(col("lift")).as("lift4"),
        r4(col("support")).as("support4"))
      .orderBy("ant", "cons")
  }

  /** M43: PrefixSpan sequential patterns over (user, day) event
    * SEQUENCES — the ordered counterpart of m41 (projection-based
    * pattern growth, distributed by prefix projections). Sequences are
    * built by an in-aggregate sort on (ts, event_id) so ties are
    * deterministic; every event is a singleton itemset, so patterns
    * render as `x>y` chains. minSupport 0.07 keeps clean margins at
    * the oracle SF (no support within ±2 of the ceil threshold);
    * maxPatternLength 2 keeps the DuckDB oracle closed-form (distinct
    * sequence count per item / per strictly-ordered item pair). */
  val m43Prefixspan: Q = (s, d) => {
    val e = events(s, d).select(
      (col("user_id") * 100000L + dayofyear(col("ts")).cast("long")).as("sid"),
      col("event_type"), unix_micros(col("ts")).as("us"), col("event_id"))
    val seqs = e.groupBy("sid")
      .agg(array_sort(collect_list(
        struct(col("us"), col("event_id"), col("event_type")))).as("evs"))
      .select(transform(col("evs"),
        x => array(x.getField("event_type"))).as("sequence"))
    new org.apache.spark.ml.fpm.PrefixSpan()
      .setMinSupport(0.07).setMaxPatternLength(2)
      .setSequenceCol("sequence")
      .findFrequentSequentialPatterns(seqs)
      .select(size(col("sequence")).as("sz"),
        concat_ws(">",
          transform(col("sequence"), a => element_at(a, 1))).as("pattern"),
        col("freq"))
      .orderBy("sz", "pattern")
  }

  /** M44 (rows-only): PCA on the leading 16 embedding dims — per-
    * component explained-variance ratio (sign-invariant, hence stable,
    * unlike the loadings). The fit is one distributed covariance
    * aggregate + a driver-side 16×16 eigen-decomposition — bounded
    * model state, the right PCA shape at any corpus size. */
  val m44Pca: Q = (s, d) => {
    val feats = embeddings(s, d).select(
      org.apache.spark.ml.functions.array_to_vector(
        slice(col("embedding"), 1, 16)).as("features"))
    val model = new org.apache.spark.ml.feature.PCA()
      .setInputCol("features").setOutputCol("pc").setK(4).fit(feats)
    val ev = model.explainedVariance.toArray
    s.createDataFrame(ev.zipWithIndex.map { case (v, i) => (i, v) })
      .toDF("component", "var_ratio")
      .select(col("component"), r4(col("var_ratio")).as("var_ratio4"))
      .orderBy("component")
  }

  /** M45 (rows-only): seeded Word2Vec over document tokens — top-3
    * synonyms of the corpus's most frequent token. numPartitions=1 and
    * a fixed seed make skip-gram updates deterministic; the embedding
    * table is bounded by the vocabulary. */
  val m45Word2vec: Q = (s, d) => {
    val docs = documents(s, d)
      .select(split(col("text"), " ").as("words"))
    val top = documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count().orderBy(col("count").desc, col("w")).limit(1)
      .collect()(0).getString(0)
    val model = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("words").setOutputCol("vec")
      .setVectorSize(16).setMinCount(2).setNumPartitions(1)
      .setSeed(42L).setMaxIter(1).fit(docs)
    model.findSynonyms(top, 3)
      .select(col("word"), r4(col("similarity")).as("sim4"))
      .orderBy(col("sim4").desc, col("word"))
  }

  /** M46: exact two-sample Kolmogorov–Smirnov statistic — THE
    * distribution-drift check a training pipeline runs between data
    * snapshots (here: l_extendedprice under returnflag A vs R).
    * D = max over observed values of |ECDF_A − ECDF_B|. The ECDFs are
    * cumulative counts in global value order — a data-scaling running
    * total, so both series ride ONE [[graft.operators.PrefixSum]]
    * range-partition pass (never a single-partition window); the final
    * max is an ordinary aggregate. Exact integer counts into one
    * rounded division at the edge → bit-stable against the oracle's
    * window-function form. */
  val m46KsTest: Q = (s, d) => {
    val byVal = lineitem(s, d)
      .where(col("l_returnflag").isin("A", "R"))
      .groupBy(col("l_extendedprice").as("p"))
      .agg(sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("na"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("nb"))
    val cum = graft.operators.PrefixSum.withRunningTotals(
      byVal, Seq("p"), Seq("na" -> "cna", "nb" -> "cnb"))
    val tot = byVal.agg(sum("na").as("n"), sum("nb").as("m"))
    cum.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"), max(col("m")).as("m"),
        r4(max(abs(
          col("cna").cast("double") / col("n").cast("double")
            - col("cnb").cast("double") / col("m").cast("double")))).as("d4"))
  }

  /** M47: exact Mann–Whitney U (rank-sum) — the nonparametric
    * location-shift drift test beside m46's KS. Tie handling is exact:
    * per distinct value, the midrank is (C − c) + (c+1)/2 where C is
    * the inclusive running total of combined counts — kept as DOUBLED
    * integers (2·midrank = 2C − c + 1) so U is computed entirely in
    * exact BIGINT arithmetic; the only float is the AUC effect size
    * U/(n·m) at the edge (the rank-biserial/AUC equivalence). The
    * running total rides the same [[graft.operators.PrefixSum]]
    * range-partition pass as m46 — no single-partition window. */
  val m47Mannwhitney: Q = (s, d) => {
    val byVal = lineitem(s, d)
      .where(col("l_returnflag").isin("A", "R"))
      .groupBy(col("l_extendedprice").as("p"))
      .agg(sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("na"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("nb"))
      .withColumn("c", col("na") + col("nb"))
    val cum = graft.operators.PrefixSum.withRunningTotals(
      byVal, Seq("p"), Seq("c" -> "cc"))
    val tot = byVal.agg(sum("na").as("n"), sum("nb").as("m"))
    cum.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("nn"), max(col("m")).as("mm"),
        sum(col("na") * (lit(2L) * col("cc") - col("c") + lit(1L))).as("r2"))
      .select(col("nn").as("n"), col("mm").as("m"),
        (col("r2") - col("nn") * (col("nn") + 1L)).as("u2_a"),
        r4((col("r2") - col("nn") * (col("nn") + 1L)).cast("double")
          / (lit(2.0) * col("nn").cast("double") * col("mm").cast("double")))
          .as("auc4"))
  }

  /** X16: recursive CTE (Spark 4's WITH RECURSIVE) — iterative
    * transitive traversal INSIDE the SQL surface, no driver loop. The
    * hierarchy is derived deterministically from the part table itself
    * (child p → parent p div 2, a binary tree rooted at partkey 1);
    * the recursion BFS-walks it level by level — each step is one
    * distributed join of the frontier against the table, which is
    * exactly how an at-scale engine should run bounded-depth graph
    * traversals (depth ≤ ⌈log₂ max(p_partkey)⌉). Output: parts per
    * depth, plus the min/max key at each level as a structural check. */
  val x16RecursiveCte: Q = (s, d) => {
    part(s, d).select("p_partkey").createOrReplaceTempView("graft_r9_parts")
    s.sql(
      """WITH RECURSIVE walk(pk, depth) AS (
        |  SELECT p_partkey, 0 FROM graft_r9_parts WHERE p_partkey = 1
        |  UNION ALL
        |  SELECT p.p_partkey, w.depth + 1
        |  FROM graft_r9_parts p JOIN walk w ON p.p_partkey div 2 = w.pk
        |)
        |SELECT depth, count(*) AS n_parts,
        |  min(pk) AS min_pk, max(pk) AS max_pk
        |FROM walk GROUP BY depth ORDER BY depth""".stripMargin)
  }

  /** LT13: CUSUM changepoint per event_type — where does the value
    * series' mean shift? The classic statistic is the argmax of
    * |Σ_{i≤k}(x_i − μ)|; multiplying through by n turns it into exact
    * BIGINT arithmetic on quantized values: T_k = n·pre_k − k·tot
    * (pre_k = running quantized sum, tot = series total), so both
    * engines agree bit-for-bit with no float accumulation. Every
    * window is partitioned by event_type — the per-entity contract;
    * nothing is globally ordered. Ties break to the earliest k. */
  val lt13CusumChangepoint: Q = (s, d) => {
    val e = events(s, d).select(
      col("event_type"),
      unix_micros(col("ts")).as("us"), col("event_id"),
      expr("CAST(floor(value * 1e4 + 5e-1) AS BIGINT)").as("q"))
    val w = Window.partitionBy("event_type").orderBy(col("us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy("event_type")
    val scored = e
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("pre", sum("q").over(run))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("tot", sum("q").over(all))
      .withColumn("t_abs", abs(col("n") * col("pre") - col("k") * col("tot")))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("t_abs").desc, col("k"))))
      .where(col("rk") === 1)
      .select(col("event_type"), col("k").as("k_star"),
        col("us").as("us_star"), col("t_abs"))
      .orderBy("event_type")
  }

  /** M48: PolynomialExpansion — degree-2 expansion of (x, y) into
    * (x, x², y, xy, y²), checked cell-exact against the SQL products
    * (same IEEE multiplications, no rounding needed except the edge
    * r4). Stateless transformer; trivially distributed. */
  val m48PolyExpansion: Q = (s, d) => {
    val base = customer(s, d).select(
      col("c_custkey"),
      org.apache.spark.ml.functions.array_to_vector(array(
        col("c_acctbal"), col("c_nationkey").cast("double"))).as("v"))
    val pe = new org.apache.spark.ml.feature.PolynomialExpansion()
      .setInputCol("v").setOutputCol("pv").setDegree(2)
    val arr = org.apache.spark.ml.functions.vector_to_array(col("pv"))
    pe.transform(base).select(
      col("c_custkey"),
      r4(element_at(arr, 1)).as("x4"),
      r4(element_at(arr, 2)).as("xx4"),
      r4(element_at(arr, 3)).as("y4"),
      r4(element_at(arr, 4)).as("xy4"),
      r4(element_at(arr, 5)).as("yy4"))
      .orderBy("c_custkey")
  }

  /** M49: RFormula — the one-line modelling-frame API
    * (`target ~ categorical + numeric`): string-indexes and one-hot
    * encodes the categorical term (frequencyDesc, dropLast — dropLast
    * drops the LAST index, so the reference (all-zeros) level is the
    * least frequent category), assembles with the numeric term, and
    * emits the label. Rendered as columns and checked against the SQL
    * dense-rank + indicator form (m9's oracle pattern). */
  val m49Rformula: Q = (s, d) => {
    val rf = new org.apache.spark.ml.feature.RFormula()
      .setFormula("o_totalprice ~ o_orderpriority + o_custkey")
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_custkey").cast("double").as("o_custkey"),
        col("o_totalprice"))
    val arr = org.apache.spark.ml.functions.vector_to_array(col("features"))
    rf.fit(base).transform(base).select(
      col("o_orderkey"),
      element_at(arr, 1).cast("int").as("oh0"),
      element_at(arr, 2).cast("int").as("oh1"),
      element_at(arr, 3).cast("int").as("oh2"),
      element_at(arr, 4).cast("int").as("oh3"),
      r4(element_at(arr, 5)).as("cust4"),
      r4(col("label")).as("label4"))
      .orderBy("o_orderkey")
  }

  /** M50: StopWordsRemover — vocabulary-bounded filter before any
    * token statistic; checked against the SQL array filter over the
    * SAME default English stop-word list (broadcast into both plans
    * as a literal). Output: per-doc kept-token count + the first
    * kept token. */
  val m50StopWords: Q = (s, d) => {
    val sw = new org.apache.spark.ml.feature.StopWordsRemover()
      .setInputCol("toks").setOutputCol("kept").setCaseSensitive(false)
      // Pin the lowercasing locale: the DuckDB oracle uses lower();
      // an unpinned JVM default locale (e.g. Turkish dotted-i) would
      // make the two sides diverge.
      .setLocale("en_US")
    val base = documents(s, d).select(
      col("doc_id"), split(col("text"), " ").as("toks"))
    sw.transform(base).select(
      col("doc_id"),
      size(col("kept")).as("n_kept"),
      element_at(col("kept"), 1).as("first_kept"))
      .orderBy("doc_id")
  }

  /** M51: univariate feature selection — top-4 embedding dims by the
    * ANOVA F-statistic against the class label (continuous features /
    * categorical label). The oracle recomputes every dim's
    * F = MSB/MSW in SQL and takes the same top-4; the sf0.01 scores
    * separate by ~3% at the cut, so the index set is robust to float
    * noise. Selection state is k integers — broadcastable; the scoring
    * pass is one aggregate over (dim, label) cells. */
  val m51FeatureSelection: Q = (s, d) => {
    val feats = Pipelines.embeddingFeatures(embeddings(s, d))
    val sel = new org.apache.spark.ml.feature.UnivariateFeatureSelector()
      .setFeatureType("continuous").setLabelType("categorical")
      .setSelectionMode("numTopFeatures").setSelectionThreshold(4)
      .setFeaturesCol("features").setLabelCol("label").setOutputCol("sel")
    val idx = sel.fit(feats).selectedFeatures.sorted
    s.createDataFrame(idx.map(i => Tuple1(i))).toDF("feature_idx")
      .orderBy("feature_idx")
  }

  /** S19: JDBC source/sink roundtrip against embedded Derby — the
    * operational-database ingest path. The read side demonstrates the
    * ONLY shape that scales: `partitionColumn`/bounds/`numPartitions`
    * split the table into parallel range queries (4 executors each
    * pull a key range) instead of one serial cursor; the oracle is the
    * fixture itself, so a broken write or a dropped range fails the
    * hash compare. A UUID-fresh database per run avoids cross-drive
    * clashes (Derby embedded locks its directory). */
  val s19JdbcRoundtrip: Q = (s, d) => {
    val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_s19_derby_${java.util.UUID.randomUUID().toString.take(8)}")
    graft.QueryGuard.deleteRecOnExit(dir.toFile)
    val url = s"jdbc:derby:${dir.toString}/db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").jdbc(url, "NATION_T", props)
    s.read
      .option("partitionColumn", "n_nationkey")
      .option("lowerBound", "0").option("upperBound", "25")
      .option("numPartitions", "4")
      .jdbc(url, "NATION_T", props)
      .select(col("n_nationkey").cast("int").as("n_nationkey"),
        col("n_name"), col("n_regionkey").cast("int").as("n_regionkey"))
      .orderBy("n_nationkey")
  }

  /** M52: Summarizer — the one-pass per-dimension vector profile
    * (mean/variance/min/max over the embedding column), the embedding-
    * QA counterpart of lp7's column profiler: one treeAggregate over
    * the corpus, model state = 4 vectors of dim entries. Exploded to a
    * row per dimension and r4-checked against the oracle's unnest
    * aggregation (same double math the a7 stats family already pins). */
  val m52Summarizer: Q = (s, d) => {
    import org.apache.spark.ml.stat.Summarizer
    val feats = embeddings(s, d).select(
      org.apache.spark.ml.functions.array_to_vector(col("embedding")).as("v"))
    val m = feats.select(Summarizer
      .metrics("mean", "variance", "min", "max").summary(col("v")).as("s"))
      .select(
        org.apache.spark.ml.functions.vector_to_array(col("s.mean")).as("mean"),
        org.apache.spark.ml.functions.vector_to_array(col("s.variance")).as("var"),
        org.apache.spark.ml.functions.vector_to_array(col("s.min")).as("mn"),
        org.apache.spark.ml.functions.vector_to_array(col("s.max")).as("mx"))
    m.select(posexplode(arrays_zip(col("mean"), col("var"), col("mn"), col("mx")))
        .as(Seq("dim", "z")))
      .select(col("dim"),
        r4(col("z.mean")).as("mean4"), r4(col("z.var")).as("var4"),
        r4(col("z.mn")).as("min4"), r4(col("z.mx")).as("max4"))
      .orderBy("dim")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m36_imputer" -> m36Imputer,
    "m37_onevsrest" -> m37Onevsrest,
    "m38_gmm" -> m38Gmm,
    "m39_bisecting_kmeans" -> m39BisectingKmeans,
    "m40_lda" -> m40Lda,
    "m41_fpgrowth" -> m41Fpgrowth,
    "m42_assoc_rules" -> m42AssocRules,
    "m43_prefixspan" -> m43Prefixspan,
    "m44_pca" -> m44Pca,
    "m45_word2vec" -> m45Word2vec,
    "m46_ks_test" -> m46KsTest,
    "m47_mannwhitney" -> m47Mannwhitney,
    "x16_recursive_cte" -> x16RecursiveCte,
    "lt13_cusum_changepoint" -> lt13CusumChangepoint,
    "m48_poly_expansion" -> m48PolyExpansion,
    "m49_rformula" -> m49Rformula,
    "m50_stopwords" -> m50StopWords,
    "m51_feature_selection" -> m51FeatureSelection,
    "s19_jdbc_roundtrip" -> s19JdbcRoundtrip,
    "m52_summarizer" -> m52Summarizer)

  /** Default English stop-word list, embedded literally into the m50
    * oracle so DuckDB filters with the SAME vocabulary. */
  private def stopListSql: String =
    org.apache.spark.ml.feature.StopWordsRemover.loadDefaultStopWords("english")
      .map(w => "'" + w.replace("'", "''") + "'").mkString("[", ", ", "]")

  val oracleSql: Map[String, String] = Map(
    "m52_summarizer" ->
      """WITH e AS (
        |  SELECT unnest(range(len(embedding))) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings)
        |SELECT CAST(dim AS INT) AS dim,
        |  round(avg(x), 4) AS mean4,
        |  round(var_samp(x), 4) AS var4,
        |  round(min(x), 4) AS min4,
        |  round(max(x), 4) AS max4
        |FROM e GROUP BY dim ORDER BY dim""".stripMargin,
    "s19_jdbc_roundtrip" ->
      """SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS INT) AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "m51_feature_selection" ->
      """WITH e AS (
        |  SELECT label, unnest(range(len(embedding))) AS pos,
        |    unnest(embedding) AS x
        |  FROM embeddings),
        |g AS (SELECT pos, label, count(*) AS n, avg(x) AS m
        |      FROM e GROUP BY 1, 2),
        |t AS (SELECT pos, count(*) AS nt, avg(x) AS mt FROM e GROUP BY 1),
        |k AS (SELECT count(DISTINCT label) AS kk FROM embeddings),
        |msb AS (SELECT g.pos, sum(g.n * (g.m - t.mt) * (g.m - t.mt))
        |          / (k.kk - 1) AS b
        |        FROM g JOIN t USING (pos) CROSS JOIN k GROUP BY g.pos, k.kk),
        |msw AS (SELECT e.pos, sum((e.x - g.m) * (e.x - g.m))
        |          / (t.nt - k.kk) AS w
        |        FROM e JOIN g ON e.pos = g.pos AND e.label = g.label
        |        JOIN t ON e.pos = t.pos CROSS JOIN k
        |        GROUP BY e.pos, t.nt, k.kk)
        |SELECT feature_idx FROM (
        |  SELECT CAST(msb.pos AS INT) AS feature_idx, msb.b / msw.w AS f
        |  FROM msb JOIN msw USING (pos)
        |  ORDER BY f DESC, feature_idx LIMIT 4)
        |ORDER BY feature_idx""".stripMargin,
    "m48_poly_expansion" ->
      """SELECT c_custkey,
        |  round(c_acctbal, 4) AS x4,
        |  round(c_acctbal * c_acctbal, 4) AS xx4,
        |  round(CAST(c_nationkey AS DOUBLE), 4) AS y4,
        |  round(c_acctbal * CAST(c_nationkey AS DOUBLE), 4) AS xy4,
        |  round(CAST(c_nationkey AS DOUBLE) * CAST(c_nationkey AS DOUBLE), 4) AS yy4
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "m49_rformula" ->
      """WITH m AS (
        | SELECT o_orderpriority,
        |        dense_rank() OVER (ORDER BY cnt DESC, o_orderpriority ASC) - 1 AS idx
        | FROM (SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY 1) t)
        |SELECT o.o_orderkey,
        | CAST(CASE WHEN m.idx = 0 THEN 1 ELSE 0 END AS INT) AS oh0,
        | CAST(CASE WHEN m.idx = 1 THEN 1 ELSE 0 END AS INT) AS oh1,
        | CAST(CASE WHEN m.idx = 2 THEN 1 ELSE 0 END AS INT) AS oh2,
        | CAST(CASE WHEN m.idx = 3 THEN 1 ELSE 0 END AS INT) AS oh3,
        | round(CAST(o.o_custkey AS DOUBLE), 4) AS cust4,
        | round(o.o_totalprice, 4) AS label4
        |FROM orders o JOIN m USING (o_orderpriority)
        |ORDER BY o_orderkey""".stripMargin,
    "m50_stopwords" ->
      ("""WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '),
        |      w -> NOT list_contains(""".stripMargin + stopListSql +
        """, lower(w))) AS kept
        |  FROM documents)
        |SELECT doc_id, CAST(len(kept) AS INT) AS n_kept,
        |  kept[1] AS first_kept
        |FROM t ORDER BY doc_id""".stripMargin),
    "lt13_cusum_changepoint" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    event_id,
        |    CAST(floor(value * 1e4 + 5e-1) AS BIGINT) AS q
        |  FROM events),
        |s AS (
        |  SELECT event_type, us, event_id,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY us, event_id) AS BIGINT) AS k,
        |    sum(q) OVER (PARTITION BY event_type
        |      ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre,
        |    count(*) OVER (PARTITION BY event_type) AS n,
        |    sum(q) OVER (PARTITION BY event_type) AS tot
        |  FROM e),
        |t AS (
        |  SELECT event_type, k, us, abs(n * pre - k * tot) AS t_abs,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(n * pre - k * tot) DESC, k) AS rk
        |  FROM s)
        |SELECT event_type, k AS k_star, us AS us_star,
        |  CAST(t_abs AS BIGINT) AS t_abs
        |FROM t WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "x16_recursive_cte" ->
      """WITH RECURSIVE walk(pk, depth) AS (
        |  SELECT p_partkey, 0 FROM part WHERE p_partkey = 1
        |  UNION ALL
        |  SELECT p.p_partkey, w.depth + 1
        |  FROM part p JOIN walk w ON p.p_partkey // 2 = w.pk
        |)
        |SELECT CAST(depth AS INT) AS depth,
        |  CAST(count(*) AS BIGINT) AS n_parts,
        |  min(pk) AS min_pk, max(pk) AS max_pk
        |FROM walk GROUP BY depth ORDER BY depth""".stripMargin,
    "m47_mannwhitney" ->
      """WITH s AS (
        |  SELECT l_extendedprice AS p,
        |    CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ib
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |g AS (SELECT p, CAST(sum(ia) AS BIGINT) AS na,
        |        CAST(sum(ia) + sum(ib) AS BIGINT) AS c
        |      FROM s GROUP BY p),
        |cu AS (SELECT na, c, sum(c) OVER (ORDER BY p) AS cc FROM g),
        |t AS (SELECT CAST(sum(ia) AS BIGINT) AS n,
        |        CAST(sum(ib) AS BIGINT) AS m FROM s),
        |r AS (SELECT CAST(sum(na * (2 * cc - c + 1)) AS BIGINT) AS r2 FROM cu)
        |SELECT n, m,
        |  CAST(r2 - n * (n + 1) AS BIGINT) AS u2_a,
        |  round(CAST(r2 - n * (n + 1) AS DOUBLE)
        |        / (2e0 * CAST(n AS DOUBLE) * CAST(m AS DOUBLE)), 4) AS auc4
        |FROM r CROSS JOIN t""".stripMargin,
    "m46_ks_test" ->
      """WITH s AS (
        |  SELECT l_extendedprice AS p,
        |    CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ib
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |g AS (SELECT p, CAST(sum(ia) AS BIGINT) AS na,
        |        CAST(sum(ib) AS BIGINT) AS nb
        |      FROM s GROUP BY p),
        |c AS (SELECT sum(na) OVER (ORDER BY p) AS cna,
        |        sum(nb) OVER (ORDER BY p) AS cnb
        |      FROM g),
        |t AS (SELECT CAST(sum(ia) AS BIGINT) AS n,
        |        CAST(sum(ib) AS BIGINT) AS m FROM s)
        |SELECT n, m,
        |  round(max(abs(CAST(cna AS DOUBLE) / CAST(n AS DOUBLE)
        |              - CAST(cnb AS DOUBLE) / CAST(m AS DOUBLE))), 4) AS d4
        |FROM c CROSS JOIN t GROUP BY n, m""".stripMargin,
    "m43_prefixspan" ->
      """WITH e AS (
        |  SELECT user_id * 100000
        |    + CAST(date_part('doy', CAST(ts AS TIMESTAMP)) AS BIGINT) AS sid,
        |    event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
        |  FROM events),
        |n AS (SELECT count(DISTINCT sid) AS ns FROM e),
        |s1 AS (
        |  SELECT 1 AS sz, event_type AS pattern,
        |    count(DISTINCT sid) AS freq
        |  FROM e GROUP BY event_type),
        |s2 AS (
        |  SELECT 2 AS sz, a.event_type || '>' || b.event_type AS pattern,
        |    count(DISTINCT a.sid) AS freq
        |  FROM e a JOIN e b ON a.sid = b.sid
        |    AND (a.us < b.us OR (a.us = b.us AND a.event_id < b.event_id))
        |  GROUP BY 2)
        |SELECT sz, pattern, CAST(freq AS BIGINT) AS freq
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2) u CROSS JOIN n
        |WHERE freq >= ceil(0.07 * ns)
        |ORDER BY sz, pattern""".stripMargin,
    "m41_fpgrowth" ->
      """WITH b AS (
        |  SELECT DISTINCT user_id * 100000
        |    + CAST(date_part('doy', CAST(ts AS TIMESTAMP)) AS BIGINT) AS bid,
        |    event_type
        |  FROM events),
        |n AS (SELECT count(DISTINCT bid) AS nb FROM b),
        |s1 AS (
        |  SELECT 1 AS sz, event_type AS items_str, count(*) AS freq
        |  FROM b GROUP BY event_type),
        |s2 AS (
        |  SELECT 2 AS sz, a.event_type || ',' || c.event_type AS items_str,
        |    count(*) AS freq
        |  FROM b a JOIN b c ON a.bid = c.bid AND a.event_type < c.event_type
        |  GROUP BY 1, 2)
        |SELECT sz, items_str, CAST(freq AS BIGINT) AS freq
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2) u CROSS JOIN n
        |WHERE freq >= ceil(0.1 * nb)
        |ORDER BY sz, items_str""".stripMargin,
    "m42_assoc_rules" ->
      """WITH b AS (
        |  SELECT DISTINCT user_id * 100000
        |    + CAST(date_part('doy', CAST(ts AS TIMESTAMP)) AS BIGINT) AS bid,
        |    event_type
        |  FROM events),
        |n AS (SELECT count(DISTINCT bid) AS nb FROM b),
        |s1 AS (SELECT event_type, count(*) AS f FROM b GROUP BY 1),
        |p AS (
        |  SELECT a.event_type AS x, c.event_type AS y, count(*) AS f
        |  FROM b a JOIN b c ON a.bid = c.bid AND a.event_type < c.event_type
        |  GROUP BY 1, 2),
        |pairs AS (SELECT x, y, f FROM p UNION ALL SELECT y, x, f FROM p),
        |fr AS (
        |  SELECT x, y, f, nb FROM pairs CROSS JOIN n
        |  WHERE f >= ceil(0.1 * nb))
        |SELECT fr.x AS ant, fr.y AS cons,
        |  round(CAST(fr.f AS DOUBLE) / sa.f, 4) AS conf4,
        |  round((CAST(fr.f AS DOUBLE) / sa.f)
        |        / (CAST(sc.f AS DOUBLE) / fr.nb), 4) AS lift4,
        |  round(CAST(fr.f AS DOUBLE) / fr.nb, 4) AS support4
        |FROM fr
        |JOIN s1 sa ON fr.x = sa.event_type
        |JOIN s1 sc ON fr.y = sc.event_type
        |WHERE CAST(fr.f AS DOUBLE) / sa.f >= 0.25
        |ORDER BY ant, cons""".stripMargin,
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
