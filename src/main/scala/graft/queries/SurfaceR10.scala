package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch: the contract-closure tail named by the r9
  * verdict — Imputer median with a real oracle, sharded Word2Vec, the
  * SQL TABLESAMPLE parser path, `df.stat.freqItems`,
  * TrainValidationSplit, Binarizer — plus the iterative BPE merge loop
  * (the actual tokenizer-trainer primitive) on top of lt10's pair
  * statistic.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.11 (ML pipeline breadth) and §2.13 (LLM pipeline ops).
  */
object SurfaceR10 extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M36b: Imputer, MEDIAN strategy — the r9 verdict's cheapest contract
    * closure. `setRelativeError(0)` makes the internal approxQuantile
    * exact, so the fill value is a deterministic element of the data and
    * the whole column is oracle-comparable (m36's mean twin). The fit is
    * one quantile aggregate; the transform a broadcast scalar — the same
    * 100 TB shape as m36. */
  val m36bImputerMedian: Q = (s, d) => {
    val base = customer(s, d).select(
      col("c_custkey"),
      when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_acctbal"))
        .cast("double").as("bal"))
    val imp = new org.apache.spark.ml.feature.Imputer()
      .setStrategy("median").setRelativeError(0.0)
      .setInputCol("bal").setOutputCol("bal_filled")
    imp.fit(base).transform(base)
      .select(col("c_custkey"), r4(col("bal_filled")).as("bal_filled"))
      .orderBy("c_custkey")
  }

  /** M45b (rows-only): SHARDED Word2Vec — numPartitions = 4, the fit
    * shape that survives 100 TB (m45's numPartitions=1 twin is the
    * seeded determinism cross-check; this one kills the last registry
    * entry whose fit funnels the corpus through one task). Sharded
    * skip-gram updates race across partitions, so the output is
    * rows-checked here and law-checked in SurfaceR10Spec: identical
    * vocabulary to the single-partition fit, and synonym sets that
    * overlap it above a floor. */
  val m45bWord2vecSharded: Q = (s, d) => {
    val docs = documents(s, d)
      .select(filter(split(col("text"), " "), w => length(w) > 0).as("words"))
    val model = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("words").setOutputCol("vec")
      .setVectorSize(16).setMinCount(2).setNumPartitions(4)
      .setSeed(42L).setMaxIter(1).fit(docs)
    // The registry row carries the DETERMINISTIC face of the sharded
    // fit: the fitted vocabulary (minCount filter on exact word counts
    // — independent of the update race). The racy parts (vectors,
    // synonyms) are law-checked in SurfaceR10Spec against the seeded
    // 1-partition twin, keeping the whole registry bit-stable across
    // drives.
    model.getVectors
      .select(substring(col("word"), 1, 1).as("initial"))
      .groupBy("initial").agg(count(lit(1)).as("n_words"))
      .orderBy("initial")
  }

  /** X17 (rows-only): the SQL TABLESAMPLE parser path with REPEATABLE —
    * `TABLESAMPLE (10 PERCENT) REPEATABLE (42)` is per-row Bernoulli
    * sampling seeded per partition: a pure scan-time filter (no shuffle,
    * no materialization) whose membership is deterministic for a fixed
    * seed and input partitioning but engine-specific — hence rows-only
    * here, with reproducibility laws (same seed ⇒ identical sample,
    * different seed ⇒ different sample, fraction within binomial
    * bounds) in SurfaceR10Spec. Deterministic HASH-membership sampling
    * (retry-stable at any scale) is lp5/lp10/lp20's family; this row
    * covers the parser surface a SQL user reaches for. */
  val x17Tablesample: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("graft_r10_orders")
    s.sql(
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM graft_r10_orders TABLESAMPLE (10 PERCENT) REPEATABLE (42)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  /** X18: `df.stat.freqItems` — single-pass lossy counting; guaranteed
    * to return a SUPERSET of the items with frequency > support·n,
    * possibly with false positives. The superset is made deterministic
    * the way a production pipeline uses freqItems: recount the
    * candidates exactly (one aggregate over the candidate set — a
    * broadcast-size list) and keep those truly above support, which by
    * the recall guarantee equals the exact frequent-item set — so the
    * result is DuckDB-oracle-able with a plain GROUP BY/HAVING in
    * integer arithmetic (support 0.2 = 1/5). */
  val x18FreqItems: Q = (s, d) => {
    val o = orders(s, d)
    val items = o.stat.freqItems(Array("o_orderpriority"), 0.2)
      .select(explode(col("o_orderpriority_freqItems")).as("item"))
    val tot = o.agg(count(lit(1)).as("tot"))
    o.join(broadcast(items), o("o_orderpriority") === items("item"))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(tot))
      .where(col("cnt") * 5L > col("tot"))
      .select(col("item"), col("cnt"))
      .orderBy("item")
  }

  /** M53 (rows-only): TrainValidationSplit — the cheaper single-split
    * sibling of m14's CrossValidator (one fit per candidate instead of
    * k): seeded 75/25 split over a two-point regParam grid, logistic
    * regression on the embeddings. Output = the chosen regParam;
    * accuracy-beats-majority is SurfaceR10Spec's law. Model selection
    * state is one scalar — the transform side is identical to m4. */
  val m53TrainValSplit: Q = (s, d) => {
    val feats = graft.ml.Pipelines.embeddingFeatures(embeddings(s, d))
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(10).setFeaturesCol("features").setLabelCol("label")
    val grid = new org.apache.spark.ml.tuning.ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.01, 10.0)).build()
    val tvs = new org.apache.spark.ml.tuning.TrainValidationSplit()
      .setEstimator(lr)
      .setEvaluator(new org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator()
        .setLabelCol("label").setPredictionCol("prediction")
        .setMetricName("accuracy"))
      .setEstimatorParamMaps(grid)
      .setTrainRatio(0.75).setSeed(42L)
    val best = tvs.fit(feats).bestModel
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    s.range(1).select(r4(lit(best.getRegParam)).as("best_reg_param"))
  }

  /** M54: Binarizer — thresholding a numeric column into {0,1}
    * indicator form (the simplest feature transformer still missing a
    * registry row). Strictly-greater semantics, bit-checked against the
    * SQL CASE form. */
  val m54Binarizer: Q = (s, d) => {
    val base = customer(s, d).select(
      col("c_custkey"), col("c_acctbal").cast("double").as("bal"))
    new org.apache.spark.ml.feature.Binarizer()
      .setThreshold(0.0).setInputCol("bal").setOutputCol("pos")
      .transform(base)
      .select(col("c_custkey"), col("pos").cast("int").as("pos"))
      .orderBy("c_custkey")
  }

  /** LT14: the BPE MERGE LOOP — K = 3 iterations of the actual
    * byte-pair-encoding trainer on top of lt10's pair statistic. BPE
    * trains on the (word, count) table — bounded by the vocabulary,
    * ≪ corpus — with each word as a symbol sequence; one round = count
    * adjacent symbol pairs weighted by word count (distributed explode +
    * hash agg), pick the argmax (TakeOrdered limit 1; the single-row
    * collect IS the trainer's merge-table state), and merge that pair
    * greedily left-to-right in every word.
    *
    * The merge is string `replace`: each word is rendered with every
    * symbol wrapped in its own separators (`␟a␟␟b␟…`), so the
    * pair (x, y) is the literal `␟x␟␟y␟` and its replacement `␟xy␟`
    * preserves the format. Both engines' `replace` scans left-to-right
    * non-overlapping — exactly BPE's greedy merge order (a shared-
    * separator encoding would MISS back-to-back merges: in [x,y,x,y]
    * the second ␟x␟y␟ overlaps the first one's trailing separator).
    *
    * Output: the K merge rows (round, "x y", weighted count) — the
    * trainer's actual artifact. Oracle: the same three rounds unrolled
    * as DuckDB CTEs over the same encoding. */
  val lt14BpeMerges: Q = (s, d) => {
    val merges = bpeLearn(s, d)._2
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("round",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("pair",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType, nullable = false)))
    s.createDataFrame(s.sparkContext.parallelize(merges, 1), schema)
      .orderBy("round")
  }

  /** The shared BPE trainer: 3 greedy merge rounds over the word-count
    * table (each word's symbols separator-wrapped). Returns the FINAL
    * encoded table (w, ws, n) — the original word is carried through
    * untouched so lp79 can read off each word's tokenization — plus the
    * merge rows lt14 reports. The per-round driver `.collect()` is the
    * bounded top-1 argmax scalar (the documented BPE pattern). */
  private[queries] def bpeLearn(
      s: SparkSession, d: String): (DataFrame, Seq[Row]) = {
    val sep = ""
    var wc = documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(col("w"),
        array_join(
          transform(filter(split(col("w"), ""), c => length(c) > 0),
            c => concat(lit(sep), c, lit(sep))), "").as("ws"),
        col("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = (1 to 3).map { r =>
      val syms = wc.select(col("ws"), col("n"),
        filter(split(col("ws"), sep), x => length(x) > 0).as("syms"))
      val top = syms.where(size(col("syms")) >= 2)
        .select(col("n"), explode(
          transform(sequence(lit(0), size(col("syms")) - 2),
            i => struct(
              element_at(col("syms"), i + 1).as("x"),
              element_at(col("syms"), i + 2).as("y")))).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("x"), col("y")).limit(1)
        .collect()(0)
      val (x, y, cnt) = (top.getString(0), top.getString(1), top.getLong(2))
      val next = wc.select(col("w"),
        replace(col("ws"), lit(sep + x + sep + sep + y + sep),
          lit(sep + x + y + sep)).as("ws"),
        col("n"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      wc = next
      Row(r, s"$x $y", cnt)
    }
    (wc, merges)
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m36b_imputer_median" -> m36bImputerMedian,
    "m45b_word2vec_sharded" -> m45bWord2vecSharded,
    "x17_tablesample" -> x17Tablesample,
    "x18_freq_items" -> x18FreqItems,
    "m53_train_val_split" -> m53TrainValSplit,
    "m54_binarizer" -> m54Binarizer,
    "lt14_bpe_merges" -> lt14BpeMerges)

  private[queries] def bpeRound(r: Int): String = {
    val r1 = r + 1
    s"""p$r AS (
       |  SELECT list_filter(string_split(ws, chr(31)), x -> len(x) > 0) AS syms, n FROM w$r),
       |c$r AS (
       |  SELECT x, y, CAST(sum(n) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(list_transform(range(len(syms)-1), i -> syms[CAST(i+1 AS INT)])) AS x,
       |           unnest(list_transform(range(len(syms)-1), i -> syms[CAST(i+2 AS INT)])) AS y, n
       |    FROM p$r WHERE len(syms) >= 2) GROUP BY 1, 2),
       |t$r AS (SELECT $r AS round, x, y, cnt FROM c$r ORDER BY cnt DESC, x, y LIMIT 1),
       |w$r1 AS (
       |  SELECT w, replace(ws, chr(31) || t$r.x || chr(31) || chr(31) || t$r.y || chr(31),
       |                     chr(31) || t$r.x || t$r.y || chr(31)) AS ws, n
       |  FROM w$r CROSS JOIN t$r)""".stripMargin
  }


  /** Shared oracle text: the encoded word table w1 plus three unrolled
    * merge rounds ending in w4 / t1..t3 — lt14 reads the merges, lp79
    * reads the final encodings. */
  private[queries] def bpeChainSql: String =
    s"""w1 AS (
       |  SELECT w, list_aggr(list_transform(range(len(w)),
       |           i -> chr(31) || w[CAST(i+1 AS INT)] || chr(31)),
       |         'string_agg', '') AS ws,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY w),
       |${bpeRound(1)},
       |${bpeRound(2)},
       |${bpeRound(3)}""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "m45b_word2vec_sharded" ->
      """WITH wc AS (
        |  SELECT w, count(*) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE len(w) > 0 GROUP BY w)
        |SELECT substr(w, 1, 1) AS initial, CAST(count(*) AS BIGINT) AS n_words
        |FROM wc WHERE c >= 2 GROUP BY 1 ORDER BY 1""".stripMargin,
    "m36b_imputer_median" ->
      """WITH b AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL
        |         ELSE c_acctbal END AS bal
        |  FROM customer),
        |m AS (SELECT quantile_disc(bal, 0.5) AS med FROM b)
        |SELECT c_custkey, round(coalesce(bal, med), 4) AS bal_filled
        |FROM b CROSS JOIN m ORDER BY c_custkey""".stripMargin,
    "x18_freq_items" ->
      """WITH t AS (SELECT CAST(count(*) AS BIGINT) AS tot FROM orders)
        |SELECT o_orderpriority AS item, CAST(count(*) AS BIGINT) AS cnt
        |FROM orders CROSS JOIN t
        |GROUP BY o_orderpriority, tot
        |HAVING count(*) * 5 > tot
        |ORDER BY item""".stripMargin,
    "m54_binarizer" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END AS pos
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "lt14_bpe_merges" ->
      s"""WITH $bpeChainSql
         |SELECT round, x || ' ' || y AS pair, cnt FROM (
         |  SELECT * FROM t1 UNION ALL SELECT * FROM t2 UNION ALL SELECT * FROM t3)
         |ORDER BY round""".stripMargin)
}
