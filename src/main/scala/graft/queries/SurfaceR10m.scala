package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Orc, Tables}

/** Round-10 surface batch 13: corpus association + pipeline utilities —
  * PMI collocation mining (the phrase-detection primitive behind
  * word2vec-style phrase vocabularies), rolling Pearson correlation
  * between two daily series, deterministic negative sampling for
  * contrastive training pairs, a data-quality expectations suite (the
  * ingest gate a production pipeline runs before training), and the
  * per-vertex local clustering coefficient on the kNN graph (lg2's
  * triangle counts normalized by degree).
  *
  * Float discipline as in SurfaceR10l: closed-forms run on exact
  * integer counts through ONE shared SQL text per formula.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.10–§2.12 (LLM pipeline), §2.13 (statistics).
  */
object SurfaceR10m extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LT21: PMI collocations ----

  private val pmiSql =
    "ln((CAST(cxy AS DOUBLE) / npair) / ((CAST(cx AS DOUBLE) / ntok) * (CAST(cy AS DOUBLE) / ntok)))"

  /** LT21: PMI COLLOCATIONS — pointwise mutual information of adjacent
    * token pairs vs their unigram frequencies; pairs with high PMI are
    * phrases ("new york") worth merging into single vocabulary items
    * before embedding training. Three narrow aggregates off one token
    * explode (bigram counts, unigram counts, two scalars); the unigram
    * join keys are words, so at 100 TB both joins shuffle on the word —
    * the same plan as l9's TF-IDF. All counts exact; the single ln()
    * runs on identical doubles both sides. */
  val lt21Pmi: Q = (s, d) => {
    val docs = documents(s, d).withColumn("toks", split(col("text"), " "))
    val pairs = docs.select(explode(expr(
      "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"))
      .as("p")).select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uni = docs.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val scal = pairs.agg(count(lit(1)).as("npair"))
      .crossJoin(broadcast(uni.agg(sum("cw").as("ntok"))))
    pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cxy"))
      .where(col("cxy") >= 10)
      .join(uni.select(col("w").as("w1"), col("cw").as("cx")), "w1")
      .join(uni.select(col("w").as("w2"), col("cw").as("cy")), "w2")
      .crossJoin(broadcast(scal))
      .select(col("w1"), col("w2"), col("cxy"), r4(expr(pmiSql)).as("pmi"))
      .orderBy("w1", "w2")
  }

  // ---- LT22: rolling correlation ----

  private val rollCorrSql =
    "((CAST(nn AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / " +
      "sqrt((CAST(nn AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * " +
      "(CAST(nn AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))"

  /** LT22: ROLLING CORRELATION — 7-day trailing Pearson r between two
    * daily series (shipped quantity vs line count) per return flag.
    * The input to the window is the DAY-level aggregate (bounded by
    * calendar × flags, not by fact rows), partitioned by flag — the
    * rolling sums are exact integers and the closed-form runs once per
    * day. Zero-variance windows (possible on sparse fixtures) are
    * excluded by EXACT integer guards shared with the oracle, keeping
    * ANSI division semantics clean on both engines. This is the
    * windowed twin of a7's global corr. */
  val lt22RollingCorr: Q = (s, d) => {
    val daily = lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_shipdate").cast("date").as("day"))
      .agg(sum(col("l_quantity").cast("long")).as("x"),
        count(lit(1)).as("y"))
    val w = Window.partitionBy("l_returnflag").orderBy("day")
      .rowsBetween(-6, 0)
    daily
      .withColumn("nn", count(lit(1)).over(w))
      .withColumn("sx", sum("x").over(w))
      .withColumn("sy", sum("y").over(w))
      .withColumn("sxx", sum(expr("x * x")).over(w))
      .withColumn("syy", sum(expr("y * y")).over(w))
      .withColumn("sxy", sum(expr("x * y")).over(w))
      .where(col("nn") === 7 &&
        expr("nn * sxx > sx * sx") && expr("nn * syy > sy * sy"))
      .select(col("l_returnflag"), col("day"), col("x"), col("y"),
        r4(expr(rollCorrSql)).as("roll_corr"))
      .orderBy("l_returnflag", "day")
  }

  // ---- LP34: negative sampling ----

  /** Shared md5→24-bit integer text (the lp10 nibble idiom, 6 nibbles):
    * pure function of the key string, reproducible in both engines. */
  private def hex24Sql(key: String): String =
    (1 to 6).map { i =>
      s"(instr('0123456789abcdef', substr(md5($key), $i, 1)) - 1) * ${1L << (4 * (6 - i))}"
    }.mkString("(", " + ", ")")

  /** LP34: NEGATIVE SAMPLING — k=3 deterministic random negatives per
    * anchor document for contrastive-pair training. The draw is a pure
    * function of (doc_id, k) via md5 (lp10's split idiom), so
    * membership survives repartitioning, retries, and engine choice —
    * the property that makes the pair set reproducible across the
    * fleet. Self-pairs are dropped (the standard rejection step).
    * Plan: one narrow 3× explode + a broadcast scalar — no shuffle at
    * all until the consumer joins text back on doc_id. */
  val lp34NegativeSampling: Q = (s, d) => {
    val nd = documents(s, d).agg(count(lit(1)).as("ndocs"))
    documents(s, d).select(col("doc_id"))
      .withColumn("k", explode(expr("sequence(0, 2)")))
      .withColumn("mk", concat_ws(":", col("doc_id"), col("k")))
      .crossJoin(broadcast(nd))
      .withColumn("neg_id",
        expr(s"CAST(${hex24Sql("mk")} % ndocs AS BIGINT)"))
      .where(col("neg_id") =!= col("doc_id"))
      .select("doc_id", "k", "neg_id")
      .orderBy("doc_id", "k")
  }

  // ---- LP35: data-quality expectations ----

  /** LP35: DATA-QUALITY EXPECTATIONS — the rule-suite gate (null
    * checks, FK integrity, key uniqueness, value ranges, freshness)
    * that a production ingest runs before admitting a batch to the
    * training corpus. Each rule is one aggregate (the FK rule an
    * anti-join); the result is the five-row audit table dashboards
    * consume. At 100 TB every rule is a single scan with map-side
    * combine — rules over the same table share one pass in a real
    * deployment (kept separate here so each rule's violation count is
    * independently oracle-checked). */
  val lp35DqExpectations: Q = (s, d) => {
    val o = orders(s, d); val li = lineitem(s, d); val c = customer(s, d)
    def rule(name: String, v: DataFrame) =
      v.select(lit(name).as("rule"), col("v").cast("long").as("n_violations"))
    val fk = rule("orders_custkey_fk",
      o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("v")))
    val rng = rule("lineitem_quantity_range_1_50",
      li.agg(count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1))
        .as("v")))
    val uniq = rule("orders_orderkey_unique",
      o.agg((count(lit(1)) - countDistinct("o_orderkey")).as("v")))
    val nn = rule("customer_name_not_null",
      c.agg(count(when(col("c_name").isNull, 1)).as("v")))
    val fresh = rule("lineitem_shipdate_freshness",
      li.agg(count(when(
        col("l_shipdate") > lit("1998-12-01").cast("timestamp"), 1)).as("v")))
    fk.union(rng).union(uniq).union(nn).union(fresh)
      .withColumn("passed", col("n_violations") === 0)
      .orderBy("rule")
  }

  // ---- LG6: local clustering coefficient ----

  private val ccSql =
    "(2.0 * CAST(tri AS DOUBLE) / (CAST(deg AS DOUBLE) * (deg - 1)))"

  /** LG6: LOCAL CLUSTERING COEFFICIENT — per-vertex 2·tri/(deg·(deg−1))
    * on the lg2 kNN graph: the density of a document's neighborhood
    * (cc→1 marks a closed near-dup pocket; cc→0 a hub bridging
    * unrelated docs). Degrees from the symmetrized edge list, triangle
    * counts from the oriented three-way self-join (each triangle
    * emitted once), left-joined so triangle-free vertices keep cc=0.
    * All joins are equi-joins on vertex ids — shuffle-partitioned by
    * vertex at scale, with the (degree, id) orientation bounding hub
    * fan-out exactly as lg2 documents. */
  val lg6ClusteringCoef: Q = (s, d) => {
    val e = SurfaceR6h.knnEdges(s, d).localCheckpoint(true)
    val deg = e.select(col("s").as("vec_id"))
      .union(e.select(col("t").as("vec_id")))
      .groupBy("vec_id").agg(count(lit(1)).as("deg"))
    val e1 = e.select(col("s").as("a"), col("t").as("b"))
    val e2 = e.select(col("s").as("b2"), col("t").as("c2"))
    val e3 = e.select(col("s").as("a3"), col("t").as("c3"))
    val tri = e1
      .join(e2, col("b") === col("b2"))
      .join(e3, col("a") === col("a3") && col("c2") === col("c3"))
      .select(explode(array(col("a"), col("b"), col("c2"))).as("vec_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("tri"))
    deg.join(tri, Seq("vec_id"), "left")
      .na.fill(0L, Seq("tri"))
      .where(col("deg") >= 2)
      .select(col("vec_id"), col("deg"), col("tri"),
        r4(expr(ccSql)).as("cc"))
      .orderBy("vec_id")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt21_pmi" -> lt21Pmi,
    "lt22_rolling_corr" -> lt22RollingCorr,
    "lp34_negative_sampling" -> lp34NegativeSampling,
    "lp35_dq_expectations" -> lp35DqExpectations,
    "lg6_clustering_coef" -> lg6ClusteringCoef)

  val oracleSql: Map[String, String] = Map(
    "lt21_pmi" ->
      s"""WITH bg AS (
        |  SELECT unnest(list_transform(range(len(string_split(text, ' ')) - 1),
        |    i -> string_split(text, ' ')[CAST(i + 1 AS INT)] || ' ' ||
        |         string_split(text, ' ')[CAST(i + 2 AS INT)])) AS bigram
        |  FROM documents),
        |big AS (
        |  SELECT split_part(bigram, ' ', 1) AS w1,
        |         split_part(bigram, ' ', 2) AS w2,
        |         CAST(count(*) AS BIGINT) AS cxy
        |  FROM bg GROUP BY 1, 2 HAVING count(*) >= 10),
        |uni AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cw FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w),
        |scal AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM bg) AS npair,
        |         (SELECT CAST(sum(cw) AS BIGINT) FROM uni) AS ntok)
        |SELECT w1, w2, cxy, round($pmiSql, 4) AS pmi
        |FROM big
        |JOIN (SELECT w AS w1, cw AS cx FROM uni) USING (w1)
        |JOIN (SELECT w AS w2, cw AS cy FROM uni) USING (w2)
        |CROSS JOIN scal
        |ORDER BY w1, w2""".stripMargin,
    "lt22_rolling_corr" ->
      s"""WITH daily AS (
        |  SELECT l_returnflag, CAST(l_shipdate AS DATE) AS day,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1, 2),
        |win AS (
        |  SELECT l_returnflag, day, x, y,
        |    CAST(count(*) OVER w AS BIGINT) AS nn,
        |    CAST(sum(x) OVER w AS BIGINT) AS sx,
        |    CAST(sum(y) OVER w AS BIGINT) AS sy,
        |    CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
        |    CAST(sum(y * y) OVER w AS BIGINT) AS syy,
        |    CAST(sum(x * y) OVER w AS BIGINT) AS sxy
        |  FROM daily
        |  WINDOW w AS (PARTITION BY l_returnflag ORDER BY day
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT l_returnflag, day, x, y, round($rollCorrSql, 4) AS roll_corr
        |FROM win
        |WHERE nn = 7 AND nn * sxx > sx * sx AND nn * syy > sy * sy
        |ORDER BY l_returnflag, day""".stripMargin,
    "lp34_negative_sampling" ->
      s"""WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS ndocs FROM documents),
        |base AS (
        |  SELECT doc_id, CAST(unnest(range(3)) AS INT) AS k FROM documents),
        |keyed AS (
        |  SELECT doc_id, k, doc_id || ':' || k AS mk FROM base)
        |SELECT doc_id, k,
        |  CAST(${hex24Sql("mk")} % ndocs AS BIGINT) AS neg_id
        |FROM keyed CROSS JOIN nd
        |WHERE CAST(${hex24Sql("mk")} % ndocs AS BIGINT) <> doc_id
        |ORDER BY doc_id, k""".stripMargin,
    "lp35_dq_expectations" ->
      """SELECT rule, n_violations, n_violations = 0 AS passed FROM (
        |  SELECT 'orders_custkey_fk' AS rule, CAST(count(*) AS BIGINT) AS n_violations
        |  FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |  UNION ALL
        |  SELECT 'lineitem_quantity_range_1_50',
        |    CAST(count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders_orderkey_unique',
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'customer_name_not_null',
        |    CAST(count(CASE WHEN c_name IS NULL THEN 1 END) AS BIGINT) FROM customer
        |  UNION ALL
        |  SELECT 'lineitem_shipdate_freshness',
        |    CAST(count(CASE WHEN l_shipdate > TIMESTAMP '1998-12-01' THEN 1 END) AS BIGINT)
        |  FROM lineitem)
        |ORDER BY rule""".stripMargin,
    "lg6_clustering_coef" ->
      s"""WITH ${SurfaceR6h.knnEdgesCte},
        |deg AS (
        |  SELECT vec_id, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT s AS vec_id FROM e UNION ALL SELECT t FROM e)
        |  GROUP BY vec_id),
        |tri3 AS (
        |  SELECT e1.s AS a, e1.t AS b, e2.t AS c
        |  FROM e e1 JOIN e e2 ON e2.s = e1.t
        |       JOIN e e3 ON e3.s = e1.s AND e3.t = e2.t),
        |tric AS (
        |  SELECT vec_id, CAST(count(*) AS BIGINT) AS tri FROM (
        |    SELECT a AS vec_id FROM tri3
        |    UNION ALL SELECT b FROM tri3
        |    UNION ALL SELECT c FROM tri3)
        |  GROUP BY vec_id),
        |joined AS (
        |  SELECT deg.vec_id AS vec_id, deg, coalesce(tri, CAST(0 AS BIGINT)) AS tri
        |  FROM deg LEFT JOIN tric ON tric.vec_id = deg.vec_id
        |  WHERE deg >= 2)
        |SELECT vec_id, deg, tri, round($ccSql, 4) AS cc
        |FROM joined ORDER BY vec_id""".stripMargin)
}
