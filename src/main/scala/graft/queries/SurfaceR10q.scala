package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.{Orc, Tables}

/** Round-10 surface batch 17: compressed ingest + corpus/graph laws —
  * gzip CSV round-trip (codec handling on the file source), Heaps' law
  * vocabulary-growth fit (lt19 Zipf's dual: how fast does the vocab
  * grow as the corpus grows), and degree assortativity of the kNN
  * graph (do well-connected documents link to other well-connected
  * documents).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.1 (sources), §2.11 (corpus stats), graph family (lg*).
  */
object SurfaceR10q extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- S22: gzip CSV round-trip ----

  /** S22: GZIP CSV — write nation as gzip-compressed CSV files, read
    * back with explicit schema. Compressed text is the wire format
    * most crawls arrive in; gzip is NOT splittable, so at 100 TB one
    * file = one task — the fixture writes many small .csv.gz parts
    * (one per input partition), which is exactly the layout that keeps
    * parallelism: many modest compressed files, never one giant one.
    * Oracle = the fixture table itself (s2b discipline). */
  val s22CsvGzip: Q = (s, d) => {
    val out = new java.io.File("target/tmp/s22_csv_gz").getAbsolutePath
    nation(s, d).write.mode("overwrite")
      .option("header", "true").option("compression", "gzip").csv(out)
    s.read
      .schema(StructType.fromDDL("n_nationkey INT, n_name STRING, n_regionkey INT"))
      .option("header", "true")
      .csv(out)
      .orderBy("n_nationkey")
  }

  // ---- LT26: Heaps' law fit ----

  private val betaSql =
    "((CAST(np AS DOUBLE) * sxy - sx * sy) / (CAST(np AS DOUBLE) * sxx - sx * sx))"
  private val heapsKSql =
    s"exp(sy / np - $betaSql * (sx / np))"

  /** LT26: HEAPS' LAW — fit V = K·nᵝ (type-vocabulary size vs corpus
    * token count) by log-log OLS over 10 ingest checkpoints. β ≈ 0.5
    * means vocabulary keeps growing with data (dedup/tokenizer budgets
    * must scale); β near 0 means the corpus is saturating. The TYPE
    * here is the word 3-gram (the fixture's word vocabulary is a
    * closed ~31-token set, so unigram types saturate by the first
    * checkpoint — measured β = 0.0000 exactly; 3-gram types keep
    * growing and give the law something to fit, as subword/BPE types
    * would on real text). The checkpoints are BOUNDED (10 rows):
    * vocab-at-t = count of types whose FIRST document ordinal ≤ t (the
    * w13 first-occurrence decomposition — one agg per type, no
    * cumulative window over facts), tokens-at-t a conditional sum.
    * Exact integers into ln; the OLS closed form is one shared text
    * over 10-point power sums. */
  val lt26HeapsLaw: Q = (s, d) => {
    val docs = documents(s, d).withColumn("tk", split(col("text"), " "))
      .where(size(col("tk")) >= 3)
    val toks = docs.select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(tk) - 3), " +
        "i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2]))")).as("tok"))
    val firstSeen = toks.groupBy("tok").agg(min("doc_id").as("fs"))
    val perDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("nt"))
    val nd = docs.agg(count(lit(1)).as("nd"))
    val cps = nd.select(explode(expr("sequence(1, 10)")).as("i"), col("nd"))
      .select(expr("(nd * i) div 10 - 1").as("t"))
    val vocabAt = firstSeen.crossJoin(broadcast(cps))
      .where(col("fs") <= col("t"))
      .groupBy("t").agg(count(lit(1)).as("vocab"))
    val ntokAt = perDoc.crossJoin(broadcast(cps))
      .where(col("doc_id") <= col("t"))
      .groupBy("t").agg(sum("nt").as("ntok"))
    vocabAt.join(ntokAt, "t")
      .select(expr("ln(CAST(ntok AS DOUBLE))").as("x"),
        expr("ln(CAST(vocab AS DOUBLE))").as("y"))
      .agg(count(lit(1)).as("np"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
      .select(col("np").as("n_points"),
        r4(expr(betaSql)).as("beta"),
        r4(expr(heapsKSql)).as("kk"))
  }

  // ---- LG7: degree assortativity ----

  private val assortSql =
    "((CAST(ne AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / " +
      "sqrt((CAST(ne AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) * " +
      "(CAST(ne AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)))"

  /** LG7: DEGREE ASSORTATIVITY — Newman's r: the Pearson correlation
    * of endpoint degrees over every directed edge (each undirected
    * edge counted both ways). r > 0 on a near-dup graph means dense
    * pockets link to dense pockets (template families); r < 0 means
    * hub-and-spoke (one canonical doc with many variants). Exact
    * integer degree pairs from two equi-joins on the lg2 edge list;
    * the correlation closed form is the lt22 text over exact sums. */
  val lg7Assortativity: Q = (s, d) => {
    val e = SurfaceR6h.knnEdges(s, d).localCheckpoint(true)
    val deg = e.select(col("s").as("v")).union(e.select(col("t").as("v")))
      .groupBy("v").agg(count(lit(1)).as("dg"))
    val dirs = e.select(col("s").as("va"), col("t").as("vb"))
      .union(e.select(col("t").as("va"), col("s").as("vb")))
    dirs
      .join(deg.select(col("v").as("va"), col("dg").as("dx")), "va")
      .join(deg.select(col("v").as("vb"), col("dg").as("dy")), "vb")
      .agg(count(lit(1)).as("ne"),
        sum("dx").as("sx"), sum("dy").as("sy"),
        sum(expr("dx * dx")).as("sxx"), sum(expr("dy * dy")).as("syy"),
        sum(expr("dx * dy")).as("sxy"))
      .select(col("ne").as("n_directed_edges"),
        r4(expr(assortSql)).as("assortativity"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "s22_csv_gzip" -> s22CsvGzip,
    "lt26_heaps_law" -> lt26HeapsLaw,
    "lg7_assortativity" -> lg7Assortativity)

  val oracleSql: Map[String, String] = Map(
    "s22_csv_gzip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "lt26_heaps_law" ->
      s"""WITH d3 AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |toks AS (
        |  SELECT doc_id, unnest(list_transform(range(len(tk) - 2),
        |    i -> tk[CAST(i + 1 AS INT)] || ' ' || tk[CAST(i + 2 AS INT)]
        |         || ' ' || tk[CAST(i + 3 AS INT)])) AS tok
        |  FROM d3),
        |first_seen AS (
        |  SELECT tok, CAST(min(doc_id) AS BIGINT) AS fs FROM toks GROUP BY tok),
        |per_doc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS nt FROM toks GROUP BY doc_id),
        |nd_t AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM d3),
        |cps AS (
        |  SELECT CAST((nd * i) // 10 - 1 AS BIGINT) AS t
        |  FROM nd_t CROSS JOIN (SELECT unnest(range(1, 11)) AS i)),
        |vocab_at AS (
        |  SELECT t, CAST(count(*) AS BIGINT) AS vocab
        |  FROM first_seen CROSS JOIN cps WHERE fs <= t GROUP BY t),
        |ntok_at AS (
        |  SELECT t, CAST(sum(nt) AS BIGINT) AS ntok
        |  FROM per_doc CROSS JOIN cps WHERE doc_id <= t GROUP BY t),
        |pts AS (
        |  SELECT ln(CAST(ntok AS DOUBLE)) AS x, ln(CAST(vocab AS DOUBLE)) AS y
        |  FROM vocab_at JOIN ntok_at USING (t)),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS np, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(x * y) AS sxy
        |  FROM pts)
        |SELECT np AS n_points, round($betaSql, 4) AS beta,
        |  round($heapsKSql, 4) AS kk
        |FROM agg""".stripMargin,
    "lg7_assortativity" ->
      s"""WITH ${SurfaceR6h.knnEdgesCte},
        |deg AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS dg FROM (
        |    SELECT s AS v FROM e UNION ALL SELECT t FROM e)
        |  GROUP BY v),
        |dirs AS (SELECT s AS va, t AS vb FROM e
        |         UNION ALL SELECT t, s FROM e),
        |pairs AS (
        |  SELECT da.dg AS dx, db.dg AS dy
        |  FROM dirs
        |  JOIN deg da ON da.v = dirs.va
        |  JOIN deg db ON db.v = dirs.vb),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS ne,
        |    CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
        |    CAST(sum(dx * dx) AS BIGINT) AS sxx,
        |    CAST(sum(dy * dy) AS BIGINT) AS syy,
        |    CAST(sum(dx * dy) AS BIGINT) AS sxy
        |  FROM pairs)
        |SELECT ne AS n_directed_edges, round($assortSql, 4) AS assortativity
        |FROM agg""".stripMargin)
}
