package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.{Orc, Tables, Windows}

/** Round-10 surface batch 82: embedding-compression and hybrid-
  * retrieval audits — int8 scalar quantization with a top-k recall
  * readout, and reciprocal-rank fusion of the lexical and vector arms.
  *
  * Contrast with near-siblings: lpq/lpq2 compress with PRODUCT
  * quantization (codebooks over subspaces, trained centroids); l17 is
  * the zero-training per-vector scalar alternative every serving stack
  * tries first (one scale + 8-bit codes), and the audit quantifies
  * exactly what that buys and costs. ls3/ls4 rank with ONE signal
  * (sparse TF-IDF/BM25), l4 with cosine alone; ls6 fuses both arms'
  * RANKS — 1/(60+r) summed — the standard hybrid-retrieval combiner
  * that needs no score calibration between arms (and is therefore not
  * expressible as either arm alone).
  *
  * Float discipline: int8 codes are floor(x·s + 0.5) — an explicit
  * shared formula, so both engines produce identical codes; quantized
  * dots/norms are integer-valued sums (order-free exact in doubles);
  * rank ties break on the candidate id; the mean-|Δcos| accumulates on
  * an ordered cumsum over the bounded probe×top3 set; the RRF score is
  * one fixed two-term expression.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.10 (similarity search), siblings lpq/ls3/l4.
  */
object SurfaceR10cd extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** L17: INT8 SCALAR-QUANTIZATION AUDIT — symmetric per-vector
    * max-abs quantization (code = floor(x·127/mx + 0.5), the max dim
    * always hits ±127), then: does quantized cosine preserve the
    * float top-3? One summary row: top-3 recall, mean and max |Δcos|
    * over the float top-3 pairs. Probe set bounded by design (an
    * audit samples; the serving path quantizes everything). */
  val l17Int8Audit: Q = (s, d) => {
    val base = embeddings(s, d).where(col("vec_id") < 500)
      .withColumn("mx",
        expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
      .where(col("mx") > 0)
      .withColumn("q", expr(
        "transform(embedding," +
          " x -> CAST(floor(CAST(x AS DOUBLE) * (127e0 / mx) + 0.5) AS FLOAT))"))
    // limit == the predicate's row bound (a no-op on content): it puts
    // a GlobalLimit in the broadcast build side, making the probe
    // panel's boundedness STRUCTURAL — the plan audit verifies it
    // instead of trusting the filter.
    val probes = base.where(col("vec_id") < 50).limit(50)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        col("q").as("a_q"))
    val cands = base
      .select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
        col("q").as("b_q"))
    val pairs = cands.join(broadcast(probes), col("a_id") =!= col("b_id"))
      .withColumn("cosf", VectorFunctions.cosineSim(col("a_emb"), col("b_emb")))
      .withColumn("cosq", VectorFunctions.cosineSim(col("a_q"), col("b_q")))
      .withColumn("rf", row_number().over(
        Window.partitionBy("a_id").orderBy(col("cosf").desc, col("b_id"))))
      .withColumn("rq", row_number().over(
        Window.partitionBy("a_id").orderBy(col("cosq").desc, col("b_id"))))
      .where(col("rf") <= 3 || col("rq") <= 3)
    val wCum = Windows.bounded(col("a_id"), col("b_id")).rowsBetween(
      Window.unboundedPreceding, Window.currentRow)
    pairs
      .withColumn("err", when(col("rf") <= 3, abs(col("cosq") - col("cosf"))))
      .withColumn("cerr", sum("err").over(wCum))
      .agg(
        countDistinct("a_id").as("n_probes"),
        sum(when(col("rf") <= 3 && col("rq") <= 3, 1L).otherwise(0L)).as("hits"),
        sum(when(col("rf") <= 3, 1L).otherwise(0L)).as("slots"),
        max("cerr").as("terr"), max("err").as("max_abs_err0"))
      .select(col("n_probes"),
        r4(expr("CAST(hits AS DOUBLE) / slots")).as("recall3"),
        r4(expr("terr / slots")).as("mean_abs_err"),
        r4(col("max_abs_err0")).as("max_abs_err"))
  }

  /** LS6: RECIPROCAL-RANK FUSION — for each probe document, rank all
    * other documents by (a) distinct-token Jaccard (the lexical arm)
    * and (b) embedding cosine (the vector arm), then fuse with
    * RRF(k=60) and keep the top 3. The full probe×candidate grid is
    * left-joined against token intersections so zero-overlap pairs
    * rank too (rank ties break on candidate id in both engines). */
  val ls6RrfFusion: Q = (s, d) => {
    val docs = documents(s, d)
    val toks = docs.select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), " "))).as("tok"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val emb = embeddings(s, d).select(col("vec_id"), col("embedding"))
    // limit(5) = the predicate's bound: structural boundedness for the
    // broadcast probe panel (see l17's note).
    val probeIds = docs.where(col("doc_id") < 5).limit(5)
      .select(col("doc_id").as("a_id"))
    val grid = docs.select(col("doc_id").as("b_id"))
      .crossJoin(broadcast(probeIds))
      .where(col("a_id") =!= col("b_id"))
    val inter = toks.select(col("doc_id").as("a_id"), col("tok"))
      .where(col("a_id") < 5)
      .join(toks.select(col("doc_id").as("b_id"), col("tok")), "tok")
      .where(col("a_id") =!= col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    val scored = grid
      .join(inter, Seq("a_id", "b_id"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("sa")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("sb")), "b_id")
      .withColumn("jacc",
        expr("CAST(inter AS DOUBLE) / (sa + sb - inter)"))
      .join(emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb")),
        "a_id")
      .join(emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb")),
        "b_id")
      .withColumn("cosf", VectorFunctions.cosineSim(col("a_emb"), col("b_emb")))
      .withColumn("r_lex", row_number().over(
        Window.partitionBy("a_id").orderBy(col("jacc").desc, col("b_id"))))
      .withColumn("r_vec", row_number().over(
        Window.partitionBy("a_id").orderBy(col("cosf").desc, col("b_id"))))
      .withColumn("rrf",
        expr("1e0 / (60 + r_lex) + 1e0 / (60 + r_vec)"))
      .withColumn("r_fused", row_number().over(
        Window.partitionBy("a_id").orderBy(col("rrf").desc, col("b_id"))))
    scored.where(col("r_fused") <= 3)
      .select(col("a_id"), col("b_id"),
        col("r_lex").cast("long").as("r_lex"),
        col("r_vec").cast("long").as("r_vec"),
        col("r_fused").cast("long").as("r_fused"),
        r4(col("rrf")).as("rrf4"))
      .orderBy("a_id", "r_fused")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "l17_int8_audit" -> l17Int8Audit,
    "ls6_rrf_fusion" -> ls6RrfFusion)

  val oracleSql: Map[String, String] = Map(
    "l17_int8_audit" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> abs(x)), 'max') AS mx
        |  FROM embeddings WHERE vec_id < 500),
        |coded AS (
        |  SELECT vec_id, emb,
        |    list_transform(emb, x -> floor(x * (127e0 / mx) + 0.5)) AS q
        |  FROM base WHERE mx > 0),
        |pairs AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    list_cosine_similarity(a.emb, b.emb) AS cosf,
        |    list_cosine_similarity(a.q, b.q) AS cosq
        |  FROM coded a JOIN coded b ON a.vec_id < 50 AND a.vec_id <> b.vec_id),
        |ranked AS (
        |  SELECT a_id, b_id, cosf, cosq,
        |    row_number() OVER (PARTITION BY a_id ORDER BY cosf DESC, b_id) AS rf,
        |    row_number() OVER (PARTITION BY a_id ORDER BY cosq DESC, b_id) AS rq
        |  FROM pairs),
        |kept AS (
        |  SELECT *, CASE WHEN rf <= 3 THEN abs(cosq - cosf) END AS err
        |  FROM ranked WHERE rf <= 3 OR rq <= 3),
        |cum AS (
        |  SELECT *, sum(err) OVER (ORDER BY a_id, b_id
        |    ROWS UNBOUNDED PRECEDING) AS cerr
        |  FROM kept)
        |SELECT CAST(count(DISTINCT a_id) AS BIGINT) AS n_probes,
        |  round(CAST(sum(CASE WHEN rf <= 3 AND rq <= 3 THEN 1 ELSE 0 END)
        |      AS DOUBLE)
        |    / sum(CASE WHEN rf <= 3 THEN 1 ELSE 0 END), 4) AS recall3,
        |  round(max(cerr) / sum(CASE WHEN rf <= 3 THEN 1 ELSE 0 END), 4)
        |    AS mean_abs_err,
        |  round(max(err), 4) AS max_abs_err
        |FROM cum""".stripMargin,
    "ls6_rrf_fusion" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' ')))
        |    AS tok
        |  FROM documents),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
        |  FROM toks GROUP BY doc_id),
        |grid AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM documents a CROSS JOIN documents b
        |  WHERE a.doc_id < 5 AND a.doc_id <> b.doc_id),
        |inter AS (
        |  SELECT ta.doc_id AS a_id, tb.doc_id AS b_id,
        |    CAST(count(*) AS BIGINT) AS inter
        |  FROM toks ta JOIN toks tb ON ta.tok = tb.tok
        |  WHERE ta.doc_id < 5 AND ta.doc_id <> tb.doc_id
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT g.a_id, g.b_id,
        |    CAST(coalesce(i.inter, 0) AS DOUBLE)
        |      / (sa.sz + sb.sz - coalesce(i.inter, 0)) AS jacc,
        |    list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
        |      CAST(eb.embedding AS DOUBLE[])) AS cosf
        |  FROM grid g
        |  LEFT JOIN inter i ON g.a_id = i.a_id AND g.b_id = i.b_id
        |  JOIN sizes sa ON g.a_id = sa.doc_id
        |  JOIN sizes sb ON g.b_id = sb.doc_id
        |  JOIN embeddings ea ON g.a_id = ea.vec_id
        |  JOIN embeddings eb ON g.b_id = eb.vec_id),
        |ranked AS (
        |  SELECT a_id, b_id,
        |    row_number() OVER (PARTITION BY a_id ORDER BY jacc DESC, b_id)
        |      AS r_lex,
        |    row_number() OVER (PARTITION BY a_id ORDER BY cosf DESC, b_id)
        |      AS r_vec
        |  FROM scored),
        |fused AS (
        |  SELECT a_id, b_id,
        |    CAST(r_lex AS BIGINT) AS r_lex, CAST(r_vec AS BIGINT) AS r_vec,
        |    1e0 / (60 + r_lex) + 1e0 / (60 + r_vec) AS rrf,
        |    row_number() OVER (PARTITION BY a_id
        |      ORDER BY 1e0 / (60 + r_lex) + 1e0 / (60 + r_vec) DESC, b_id)
        |      AS r_fused
        |  FROM ranked)
        |SELECT a_id, b_id, r_lex, r_vec, CAST(r_fused AS BIGINT) AS r_fused,
        |  round(rrf, 4) AS rrf4
        |FROM fused WHERE r_fused <= 3
        |ORDER BY a_id, r_fused""".stripMargin)
}
