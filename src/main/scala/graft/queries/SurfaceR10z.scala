package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.{Orc, Tables}
import graft.streaming.StreamingOps

/** Round-10 surface batch 26: bag-semantics set operators (INTERSECT
  * ALL / EXCEPT ALL — u2/u3 covered the DISTINCT forms only), the
  * per-source dataset card (the release-documentation artifact a
  * curated corpus ships with), and the streaming progress-metrics
  * surface (StreamingQueryProgress as queryable data).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.7 (set ops), §2.9 (streaming), §2.11 (corpus stats).
  */
object SurfaceR10z extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- U5/U6: bag-semantics set ops ----

  /** U5: INTERSECT ALL — multiset intersection of the 'O'-order and
    * 'F'-order customer bags: each customer appears min(#O, #F) times
    * (the DISTINCT form u2 collapses multiplicity, which loses the
    * "how many matched" answer reconciliation queries need). Output
    * aggregated per key so the row order is total. Spark plans this as
    * a single shuffle with per-key counters — same cost class as the
    * distinct form. */
  val u5IntersectAll: Q = (s, d) => {
    val a = orders(s, d).where(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    val b = orders(s, d).where(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    a.intersectAll(b).groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .orderBy("o_custkey")
  }

  /** U6: EXCEPT ALL — multiset difference of the same bags: max(0,
    * #O − #F) copies per customer — the "unmatched after pairing"
    * count a ledger reconciliation reports. */
  val u6ExceptAll: Q = (s, d) => {
    val a = orders(s, d).where(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    val b = orders(s, d).where(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    a.exceptAll(b).groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .orderBy("o_custkey")
  }

  // ---- LP44: dataset card ----

  private val langEntTermSql =
    "(-(CAST(cl AS DOUBLE) / nd) * ln(CAST(cl AS DOUBLE) / nd))"

  /** LP44: DATASET CARD — the one-row-per-source release summary a
    * curated corpus publishes: document/token volume, language
    * diversity (count + entropy of the language mix), exact-duplicate
    * rate (the lt28 keeper join), and mean document length. This is
    * the artifact dataset documentation standards ask for, assembled
    * from the same aggregates the individual audit ops use — one scan
    * for the per-doc facts, one content-hash join for dup attribution,
    * all counts exact. */
  val lp44DatasetCard: Q = (s, d) => {
    val docs = documents(s, d).select(col("doc_id"), col("source"),
      col("lang"), md5(col("text")).as("h"),
      length(col("text")).cast("long").as("nc"),
      size(split(col("text"), " ")).cast("long").as("nt"))
    val keeper = docs.groupBy("h").agg(min("doc_id").as("keep_id"))
    val tagged = docs.join(keeper, "h")
      .withColumn("is_dup", col("doc_id") =!= col("keep_id"))
    val base = tagged.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
        countDistinct("lang").as("n_langs"),
        count(when(col("is_dup"), 1)).as("dup_docs"),
        sum("nc").as("sum_chars"))
    val cells = tagged.groupBy("source", "lang").agg(count(lit(1)).as("cl"))
    val tots = cells.groupBy("source").agg(sum("cl").as("nd"))
    val langEnt = cells.join(broadcast(tots), "source")
      .groupBy("source").agg(sum(expr(langEntTermSql)).as("lang_ent_raw"))
    base.join(langEnt, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_langs"),
        r4(expr("CAST(dup_docs AS DOUBLE) / n_docs")).as("dup_rate"),
        r4(expr("CAST(sum_chars AS DOUBLE) / n_docs")).as("mean_chars"),
        r4(col("lang_ent_raw")).as("lang_entropy"))
      .orderBy("source")
  }

  // ---- T21: streaming progress metrics ----

  /** T21: STREAM METRICS — the StreamingQueryProgress surface as data:
    * run the t4 tumbling aggregation through the micro-batch engine
    * and report the engine's OWN accounting (Σ numInputRows across
    * progress events) as a queryable row. The oracle is the fixture
    * row count — so the progress plumbing itself is hash-checked
    * against ground truth, which is exactly how a production pipeline
    * monitors ingest completeness (rows the ENGINE says it read vs
    * rows the source holds). recentProgress is read synchronously
    * after processAllAvailable, no async listener race. */
  val t21StreamMetrics: Q = (s, d) => {
    val df = StreamingOps.tumblingCounts(StreamingOps.eventsStream(s, d))
    val q = df.writeStream.format("memory").queryName("t21_sink")
      .outputMode(OutputMode.Complete()).start()
    val total =
      try { q.processAllAvailable(); q.recentProgress.map(_.numInputRows).sum }
      finally q.stop()
    import s.implicits._
    Seq(total).toDF("total_input_rows")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "u5_intersect_all" -> u5IntersectAll,
    "u6_except_all" -> u6ExceptAll,
    "lp44_dataset_card" -> lp44DatasetCard,
    "t21_stream_metrics" -> t21StreamMetrics)

  val oracleSql: Map[String, String] = Map(
    "u5_intersect_all" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "u6_except_all" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "lp44_dataset_card" ->
      s"""WITH docs AS (
        |  SELECT doc_id, source, lang, md5(text) AS h,
        |    CAST(length(text) AS BIGINT) AS nc,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |  FROM documents),
        |keeper AS (SELECT h, CAST(min(doc_id) AS BIGINT) AS keep_id
        |           FROM docs GROUP BY h),
        |tagged AS (
        |  SELECT docs.*, doc_id <> keep_id AS is_dup
        |  FROM docs JOIN keeper USING (h)),
        |base AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(nt) AS BIGINT) AS n_tokens,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(count(CASE WHEN is_dup THEN 1 END) AS BIGINT) AS dup_docs,
        |    CAST(sum(nc) AS BIGINT) AS sum_chars
        |  FROM tagged GROUP BY source),
        |lang_cells AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS cl
        |  FROM tagged GROUP BY 1, 2),
        |lang_tot AS (
        |  SELECT source, CAST(sum(cl) AS BIGINT) AS nd
        |  FROM lang_cells GROUP BY source),
        |lang_ent AS (
        |  SELECT source, sum($langEntTermSql) AS lang_ent_raw
        |  FROM lang_cells JOIN lang_tot USING (source)
        |  GROUP BY source)
        |SELECT source, n_docs, n_tokens, n_langs,
        |  round(CAST(dup_docs AS DOUBLE) / n_docs, 4) AS dup_rate,
        |  round(CAST(sum_chars AS DOUBLE) / n_docs, 4) AS mean_chars,
        |  round(lang_ent_raw, 4) AS lang_entropy
        |FROM base JOIN lang_ent USING (source)
        |ORDER BY source""".stripMargin,
    "t21_stream_metrics" ->
      "SELECT CAST(count(*) AS BIGINT) AS total_input_rows FROM events")
}
