package graft.queries

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-6 surface additions — the curation passes a 100 TB training-data
  * pipeline runs between ingest and training:
  *
  *   - within-document repetition scoring (the Gopher/C4-style quality
  *     signal that catches boilerplate and degenerate generations),
  *   - benchmark contamination detection (n-gram overlap of the training
  *     corpus against a held-out eval set),
  *   - deterministic language-mixing sampler (hash-gated downsampling to
  *     target per-language weights — survives repartitioning/re-ingest),
  *   - GROUP BY ALL / ORDER BY ALL SQL surface,
  *   - pipeline health metrics via `Dataset.observe` (metrics ride the
  *     action that already runs; no second scan of the table).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.4 (aggregates), §2.8 (SQL surface), §2.10 (LLM pipeline).
  */
object SurfaceR6 extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- L12: within-document repetition / diversity scoring ----

  /** L12: repetition quality signals per document — unique-word ratio,
    * top-word share, and duplicate-2-gram ratio. One explode + two hash
    * aggregates + a per-doc join; everything partitions by doc_id, so at
    * 100 TB this is embarrassingly parallel with no cross-document
    * shuffle at all (the groupBys reuse the explode's doc_id hash
    * partitioning). These are the classic filters for boilerplate and
    * degenerate text (high dup-2-gram, low unique ratio).
    */
  val l12Repetition: Q = (s, d) => {
    val words = documents(s, d)
      .where(length(col("text")) > 0)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) > 1)
    val wc = words
      .select(col("doc_id"), explode(col("w")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val stats = wc.groupBy("doc_id").agg(
      sum("c").as("n_words"),
      count(lit(1)).as("n_uniq"),
      max("c").as("top_c"))
    val grams = words
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, size(w) - 2), i -> concat(w[i], ' ', w[i + 1]))"))
          .as("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n2"), countDistinct("g").as("u2"))
    stats.join(grams, "doc_id")
      .select(col("doc_id"), col("n_words"), col("n_uniq"),
        r4(col("n_uniq") / col("n_words").cast("double")).as("uniq_ratio"),
        r4(col("top_c") / col("n_words").cast("double")).as("top_share"),
        r4(lit(1.0) - col("u2") / col("n2").cast("double")).as("dup_2gram_ratio"))
      .orderBy("doc_id")
  }

  // ---- L13: benchmark contamination detection ----

  /** L13: eval-set contamination — training documents sharing any 3-word
    * gram with the benchmark slice (the deterministic doc_id % 97 subset
    * standing in for a held-out eval set), with the count of distinct
    * shared grams. Gram width is corpus-tuned (real pipelines use 8–13
    * over natural text; 3 keeps the signal non-vacuous on the word-salad
    * fixtures). The benchmark gram set is tiny relative to the corpus,
    * so the join broadcasts it — at 100 TB this is one corpus scan
    * against a broadcast hash set (or a bloom filter when the eval suite
    * outgrows the broadcast threshold), never a shuffle of corpus grams.
    */
  val l13Contamination: Q = (s, d) => {
    val grams = documents(s, d)
      .where(length(col("text")) > 0)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(0, size(w) - 3), i -> array_join(slice(w, i + 1, 3), ' '))"))
          .as("g"))
      .distinct()
    val bench = grams.where(col("doc_id") % 97 === 0)
      .select(col("g")).distinct()
    grams.where(col("doc_id") % 97 =!= 0)
      .join(broadcast(bench), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  // ---- L14: deterministic language-mixing sampler ----

  /** The md5-nibble bucket in 0..4095 shared by both engines — same
    * portable-SQL idiom as lp10's split (instr over the hex alphabet).
    */
  private def mixBucketSql(idCol: String): String = {
    def nib(k: Int) =
      s"(instr('0123456789abcdef', substr(md5($idCol || 'mix'), $k, 1)) - 1)"
    // CAST keeps the column BIGINT on both engines (Spark's int
    // arithmetic would otherwise emit INTEGER vs DuckDB's BIGINT).
    s"CAST(${nib(1)} * 256 + ${nib(2)} * 16 + ${nib(3)} AS BIGINT)"
  }

  /** L14: data mixing — downsample each language to a target weight with
    * a hash gate: keep iff md5-bucket(doc_id) < weight·4096. Membership
    * is a pure function of (doc_id, salt), so the mix is reproducible
    * across repartitioning, retries, and re-ingestion — no RNG state, no
    * sampling drift between cluster runs. The weights table is a handful
    * of rows and broadcasts; the corpus scan is one narrow projection +
    * filter, which is exactly what you want when the corpus is 100 TB.
    */
  val l14MixSample: Q = (s, d) => {
    import s.implicits._
    val weights = Seq(
      ("en", 4096), ("de", 2458), ("fr", 2048), ("es", 1638), ("zh", 1024))
      .toDF("w_lang", "keep_below")
    documents(s, d)
      .select(col("doc_id"), col("lang"),
        expr(mixBucketSql("doc_id")).as("bucket"))
      .join(broadcast(weights), col("lang") === col("w_lang"))
      .where(col("bucket") < col("keep_below"))
      .select("doc_id", "lang", "bucket")
      .orderBy("doc_id")
  }

  // ---- A21: GROUP BY ALL / ORDER BY ALL ----

  /** Shared SQL text — runs verbatim on Spark and DuckDB (both support
    * the ALL shorthand), so the pairing cannot drift.
    */
  private def a21Sql(t: String): String =
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       |  round(sum(l_quantity), 4) AS sum_qty
       |FROM $t
       |GROUP BY ALL ORDER BY ALL""".stripMargin

  /** A21: GROUP BY ALL / ORDER BY ALL — the SQL-surface shorthand that
    * groups by every non-aggregate select item. Plans identically to the
    * explicit list (one hash aggregate + exchange on the grouping keys).
    */
  val a21GroupByAll: Q = (s, d) => {
    lineitem(s, d).createOrReplaceTempView("graft_a21_lineitem")
    s.sql(Orc.round4Sql(a21Sql("graft_a21_lineitem")))
  }

  // ---- X6: pipeline health metrics via observe ----

  /** X6: `Dataset.observe` — named metrics collected ON the action that
    * already runs (an accumulator per executor task, merged on the
    * driver), so data-quality counters at 100 TB cost zero extra scans.
    * The query materializes the observed aggregates as a one-row frame;
    * the oracle recomputes them relationally.
    */
  val x6Observe: Q = (s, d) => {
    import s.implicits._
    val obs = Observation("x6")
    val li = lineitem(s, d).observe(obs,
      count(lit(1)).as("n_rows"),
      sum(col("l_quantity")).as("sum_qty"),
      count(when(col("l_discount") > lit(0.05), 1)).as("n_discounted"))
    li.write.mode("overwrite").format("noop").save()
    val m = obs.get
    Seq((m("n_rows").asInstanceOf[Long],
      m("sum_qty").asInstanceOf[Double],
      m("n_discounted").asInstanceOf[Long]))
      .toDF("n_rows", "sum_qty", "n_discounted")
      .select(col("n_rows"), r4(col("sum_qty")).as("sum_qty"), col("n_discounted"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "l12_repetition" -> l12Repetition,
    "l13_contamination" -> l13Contamination,
    "l14_mix_sample" -> l14MixSample,
    "a21_group_by_all" -> a21GroupByAll,
    "x6_observe" -> x6Observe)

  val oracleSql: Map[String, String] = Map(
    "l12_repetition" ->
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE length(text) > 0 AND len(string_split(text, ' ')) > 1
        |),
        |wc AS (
        |  SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest(w) AS tok FROM words) GROUP BY doc_id, tok
        |),
        |stats AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |    CAST(count(*) AS BIGINT) AS n_uniq, CAST(max(c) AS BIGINT) AS top_c
        |  FROM wc GROUP BY doc_id
        |),
        |grams AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n2,
        |    CAST(count(DISTINCT g) AS BIGINT) AS u2
        |  FROM (
        |    SELECT doc_id, array_to_string(list_slice(w, i, i + 1), ' ') AS g
        |    FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM words))
        |  GROUP BY doc_id
        |)
        |SELECT s.doc_id AS doc_id, n_words, n_uniq,
        |  round(n_uniq / CAST(n_words AS DOUBLE), 4) AS uniq_ratio,
        |  round(top_c / CAST(n_words AS DOUBLE), 4) AS top_share,
        |  round(1.0 - u2 / CAST(n2 AS DOUBLE), 4) AS dup_2gram_ratio
        |FROM stats s JOIN grams g ON s.doc_id = g.doc_id
        |ORDER BY s.doc_id""".stripMargin,
    "l13_contamination" ->
      """WITH words AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE length(text) > 0 AND len(string_split(text, ' ')) >= 3
        |),
        |g AS (
        |  SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i + 2), ' ') AS g
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM words)
        |),
        |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
        |SELECT t.doc_id, CAST(count(DISTINCT t.g) AS BIGINT) AS n_shared_grams
        |FROM g t JOIN bench b ON t.g = b.g
        |WHERE t.doc_id % 97 <> 0
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,
    "l14_mix_sample" ->
      s"""WITH w AS (
         |  SELECT * FROM (VALUES ('en', 4096), ('de', 2458), ('fr', 2048),
         |    ('es', 1638), ('zh', 1024)) AS t(w_lang, keep_below)
         |)
         |SELECT doc_id, lang, ${mixBucketSql("doc_id")} AS bucket
         |FROM documents JOIN w ON lang = w_lang
         |WHERE ${mixBucketSql("doc_id")} < keep_below
         |ORDER BY doc_id""".stripMargin,
    "a21_group_by_all" -> a21Sql("lineitem"),
    "x6_observe" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT)
        |    AS n_discounted
        |FROM lineitem""".stripMargin)
}
