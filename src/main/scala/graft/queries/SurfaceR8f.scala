package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-8 batch 6: kNN-vote classification, seasonal-strength
  * decomposition, and Adamic–Adar link prediction.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.11 (M model family), §2.13 (time series, graph ops).
  */
object SurfaceR8f extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M31: 5-NN majority-vote classification of the deterministic query
    * batch (vec_id ≡ 0 mod 67, the lpq convention) against the full
    * corpus — the lazy-learner counterpart to m30's centroids. Cosines
    * run in m30's 1e-4-quantized integer space (exact sums ⇒ identical
    * bits ⇒ identical neighbor ranking on both engines; ties break by
    * corpus id). Brute force is the right PRIMARY here only because the
    * query side is a small batch broadcast against the corpus — the
    * corpus-×-corpus version of this shape is what l5/li/lpq replace
    * with LSH/IVF/PQ. Vote ties break by label ascending. */
  val m31KnnVote: Q = (s, d) => {
    val dims = embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
      .withColumn("qv",
        expr("CAST(floor(CAST(v AS DOUBLE) * 1e4 + 5e-1) AS BIGINT)"))
      .select("vec_id", "i", "qv")
    val norms = dims.groupBy("vec_id").agg(sum(col("qv") * col("qv")).as("nrm"))
    val qdims = dims.where(col("vec_id") % 67 === 0)
      .toDF("q_id", "i", "qq")
    val dots = dims.join(broadcast(qdims), "i")
      .where(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("qv") * col("qq")).as("dot"))
    val cos = col("dot").cast("double") /
      (sqrt(col("nq").cast("double")) * sqrt(col("nc").cast("double")))
    val top5 = dots
      .join(norms.toDF("q_id", "nq"), "q_id")
      .join(norms.toDF("vec_id", "nc"), "vec_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(cos.desc, col("vec_id").asc)))
      .where(col("rn") <= 5)
    val votes = top5
      .join(embeddings(s, d).select(col("vec_id"), col("label")), "vec_id")
      .groupBy("q_id", "label").agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(
        Window.partitionBy("q_id").orderBy(col("n_votes").desc, col("label").asc)))
      .where(col("vr") === 1)
      .select(col("q_id"), col("label").cast("long").as("pred"),
        col("n_votes"))
    embeddings(s, d)
      .select(col("vec_id").as("q_id"), col("label").cast("long").as("true_label"))
      .join(votes, "q_id")
      .select("q_id", "true_label", "pred", "n_votes")
      .orderBy("q_id")
  }

  /** LT12: day-of-week seasonal strength per event_type — one-way
    * ANOVA η² of value on weekday (1 − SS_within/SS_total), the
    * "is there weekly seasonality worth modelling" probe. Everything
    * derives from exact integer sums of 1e-4-quantized values per
    * (type, dow) cell: SS_within = Σq² − Σ_d S_d²/n_d and SS_total =
    * Σq² − S²/N are computed from those sums in doubles, identically
    * on both engines. Two tiny hash aggs (7 cells per type), no
    * window over facts. Also reports the peak weekday by mean (tie →
    * smaller dow). */
  val lt12SeasonalStrength: Q = (s, d) => {
    val e = events(s, d).select(col("event_type"),
      expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("dow"),
      expr("CAST(floor(value * 1e4 + 5e-1) AS BIGINT)").as("q"))
    val cells = e.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("nd"), sum("q").as("sd"),
        sum(col("q") * col("q")).as("ssd"))
    val mean = col("sd").cast("double") / col("nd").cast("double")
    val ranked = cells.withColumn("mr", row_number().over(
      Window.partitionBy("event_type").orderBy(mean.desc, col("dow").asc)))
    val peak = ranked.where(col("mr") === 1)
      .select(col("event_type"), col("dow").as("peak_dow"),
        Orc.r4(mean / lit(1e4)).as("peak_mean"))
    // each cell's S_d^2/n_d is floor-quantized to integer q^2-units so
    // the 7-term sum is exact — a double sum would depend on add order
    val tot = cells
      .withColumn("g", expr(
        "CAST(floor(CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE) / CAST(nd AS DOUBLE) + 5e-1) AS BIGINT)"))
      .groupBy("event_type")
      .agg(sum("nd").as("n"), sum("sd").as("s"), sum("ssd").as("ss"),
        sum("g").as("sgrp"))
    val ssw = col("ss").cast("double") - col("sgrp").cast("double")
    val sst = col("ss").cast("double") -
      col("s").cast("double") * col("s").cast("double") / col("n").cast("double")
    tot
      .select(col("event_type"), col("n"),
        Orc.r4(lit(1e0) - ssw / sst).as("eta2"))
      .join(peak, "event_type")
      .select("event_type", "n", "eta2", "peak_dow", "peak_mean")
      .orderBy("event_type")
  }

  /** LG4: Adamic–Adar link prediction over the customer–part bipartite
    * graph (edges = distinct purchase pairs): candidate customer pairs
    * come from an equi-join on shared parts — never all-pairs — and
    * score Σ 1/ln(deg(part)). Hubs (deg > 50) are dropped before the
    * pairing, the standard suppression that keeps the per-part fanout
    * deg² bounded at any scale (and removes near-zero-information
    * terms). Each 1/ln term is quantized to integer 1e-6 units so the
    * per-pair sum is EXACT — float addition order would otherwise
    * differ between engines. Top-20 pairs by score (ties → ids). */
  val lg4AdamicAdar: Q = (s, d) => {
    val edges = orders(s, d).join(lineitem(s, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    val deg = edges.groupBy("p").agg(count(lit(1)).as("deg"))
      .where(col("deg") > 1 && col("deg") <= 50)
      .withColumn("w",
        expr("CAST(floor(1e6 / ln(CAST(deg AS DOUBLE)) + 5e-1) AS BIGINT)"))
    val withW = edges.join(deg, "p")
    val pairs = withW.toDF("p", "a", "dega", "wa")
      .join(withW.toDF("p", "b", "degb", "wb"), "p")
      .where(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(sum("wa").as("aa_int"), count(lit(1)).as("n_shared"))
    pairs
      .select(col("a"), col("b"), col("n_shared"),
        Orc.r4(col("aa_int").cast("double") / lit(1e6)).as("aa"))
      .orderBy(col("aa").desc, col("a"), col("b"))
      .limit(20)
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m31_knn_vote" -> m31KnnVote,
    "lt12_seasonal_strength" -> lt12SeasonalStrength,
    "lg4_adamic_adar" -> lg4AdamicAdar)

  val oracleSql: Map[String, String] = Map(
    "m31_knn_vote" ->
      """WITH dims AS (
        |  SELECT vec_id, i,
        |    CAST(floor(CAST(list_extract(embedding, CAST(i + 1 AS INT)) AS DOUBLE)
        |               * 1e4 + 5e-1) AS BIGINT) AS qv
        |  FROM embeddings CROSS JOIN range(64) AS t(i)),
        |norms AS (
        |  SELECT vec_id, CAST(sum(qv * qv) AS BIGINT) AS nrm
        |  FROM dims GROUP BY vec_id),
        |dots AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    CAST(sum(c.qv * q.qv) AS BIGINT) AS dot
        |  FROM dims c JOIN dims q ON c.i = q.i
        |  WHERE q.vec_id % 67 = 0 AND c.vec_id <> q.vec_id
        |  GROUP BY q.vec_id, c.vec_id),
        |top5 AS (
        |  SELECT q_id, c_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY
        |      CAST(dot AS DOUBLE) /
        |        (sqrt(CAST(nq.nrm AS DOUBLE)) * sqrt(CAST(nc.nrm AS DOUBLE)))
        |      DESC, c_id ASC) AS rn
        |  FROM dots JOIN norms nq ON nq.vec_id = q_id
        |            JOIN norms nc ON nc.vec_id = c_id),
        |votes AS (
        |  SELECT t.q_id, e.label, CAST(count(*) AS BIGINT) AS n_votes,
        |    row_number() OVER (PARTITION BY t.q_id
        |      ORDER BY count(*) DESC, e.label ASC) AS vr
        |  FROM top5 t JOIN embeddings e ON e.vec_id = t.c_id
        |  WHERE t.rn <= 5 GROUP BY t.q_id, e.label)
        |SELECT v.q_id, CAST(e.label AS BIGINT) AS true_label,
        |  CAST(v.label AS BIGINT) AS pred, v.n_votes
        |FROM votes v JOIN embeddings e ON e.vec_id = v.q_id
        |WHERE v.vr = 1 ORDER BY q_id""".stripMargin,
    "lt12_seasonal_strength" ->
      """WITH e AS (
        |  SELECT event_type,
        |    (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
        |    CAST(floor(value * 1e4 + 5e-1) AS BIGINT) AS q
        |  FROM events),
        |cells AS (
        |  SELECT event_type, dow, CAST(count(*) AS BIGINT) AS nd,
        |    CAST(sum(q) AS BIGINT) AS sd, CAST(sum(q * q) AS BIGINT) AS ssd
        |  FROM e GROUP BY event_type, dow),
        |cg AS (
        |  SELECT *, CAST(floor(CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
        |      / CAST(nd AS DOUBLE) + 5e-1) AS BIGINT) AS g
        |  FROM cells),
        |peak AS (
        |  SELECT event_type, dow AS peak_dow,
        |    round(CAST(sd AS DOUBLE) / CAST(nd AS DOUBLE) / 1e4, 4) AS peak_mean,
        |    row_number() OVER (PARTITION BY event_type ORDER BY
        |      CAST(sd AS DOUBLE) / CAST(nd AS DOUBLE) DESC, dow ASC) AS mr
        |  FROM cells),
        |tot AS (
        |  SELECT event_type, CAST(sum(nd) AS BIGINT) AS n,
        |    CAST(sum(sd) AS BIGINT) AS s, CAST(sum(ssd) AS BIGINT) AS ss,
        |    CAST(sum(g) AS BIGINT) AS sgrp
        |  FROM cg GROUP BY event_type)
        |SELECT t.event_type, t.n,
        |  round(1e0 - (CAST(ss AS DOUBLE) - CAST(sgrp AS DOUBLE)) /
        |    (CAST(ss AS DOUBLE)
        |     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 4)
        |    AS eta2,
        |  p.peak_dow, p.peak_mean
        |FROM tot t JOIN peak p ON p.event_type = t.event_type AND p.mr = 1
        |ORDER BY t.event_type""".stripMargin,
    "lg4_adamic_adar" ->
      """WITH edges AS (
        |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |deg AS (
        |  SELECT p, CAST(count(*) AS BIGINT) AS deg,
        |    CAST(floor(1e6 / ln(CAST(count(*) AS DOUBLE)) + 5e-1) AS BIGINT) AS w
        |  FROM edges GROUP BY p HAVING count(*) > 1 AND count(*) <= 50),
        |pairs AS (
        |  SELECT ea.c AS a, eb.c AS b,
        |    CAST(sum(d.w) AS BIGINT) AS aa_int,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM edges ea JOIN edges eb ON ea.p = eb.p AND ea.c < eb.c
        |       JOIN deg d ON d.p = ea.p
        |  GROUP BY ea.c, eb.c)
        |SELECT a, b, n_shared,
        |  round(CAST(aa_int AS DOUBLE) / 1e6, 4) AS aa
        |FROM pairs ORDER BY aa DESC, a, b LIMIT 20""".stripMargin)
}
