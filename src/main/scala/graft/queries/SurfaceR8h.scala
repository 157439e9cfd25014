package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 batch 8: the text file source and the cache/reuse lifecycle.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.1 (S sources) and §2.12 (X engine surface).
  */
object SurfaceR8h extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** S17: text-source round-trip — documents serialized as TAB-joined
    * lines via `write.text`, read back with `spark.read.text` (the
    * one-column `value` source every log/corpus ingest starts from),
    * re-parsed and aggregated per lang. The fixture text is space+word
    * only, so TAB is a safe field separator; the oracle reads the
    * parquet directly, so any loss in the text round-trip (encoding,
    * line splitting, column parse) fails the hash compare. */
  val s17TextFile: Q = (s, d) => {
    // per-run UUID dir (not a fixed path): concurrent drives — Bench and
    // Verify in separate JVMs — must not clobber each other's landing
    // data mid-read; cleaned by the shared exit hook
    val out = java.nio.file.Files.createTempDirectory("graft_s17_text_").toString
    graft.QueryGuard.deleteRecOnExit(new java.io.File(out))
    documents(s, d)
      .select(concat_ws("\t",
        col("doc_id").cast("string"), col("lang"), col("text")).as("value"))
      .write.mode("overwrite").text(out)
    s.read.text(out)
      .select(split(col("value"), "\t").as("p"))
      .select(element_at(col("p"), 1).cast("long").as("doc_id"),
        element_at(col("p"), 2).as("lang"),
        element_at(col("p"), 3).as("text"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("sum_len"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"))
      .orderBy("lang")
  }

  /** X14: explicit cache + reuse — one aggregate cached and consumed
    * twice (as both sides of a self-join comparing each nation's
    * revenue to its region's max). `persist()` makes the second read
    * an InMemoryTableScan instead of a recompute (asserted by spec);
    * the handle is unpersisted after materialization so the run leaves
    * no executor-memory residue. The oracle recomputes the same
    * aggregate twice in SQL — equality of results is exactly the
    * cache-coherence claim. */
  val x14CacheReuse: Q = (s, d) => {
    val rev = orders(s, d).join(customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"), col("n_name"))
      .agg(expr("CAST(sum(CAST(floor(o_totalprice * 1e4 + 5e-1) AS BIGINT)) AS BIGINT)")
        .as("qrev"))
      .persist()
    try {
      val tops = rev.groupBy(col("n_regionkey").as("rk"))
        .agg(max("qrev").as("top_qrev"))
      val out = rev.join(tops, col("n_regionkey") === col("rk"))
        .select(col("n_regionkey"), col("n_name"),
          graft.Orc.r4(col("qrev").cast("double") / lit(1e4)).as("revenue"),
          (col("qrev") === col("top_qrev")).as("is_region_top"))
        .orderBy("n_regionkey", "n_name")
      out.count() // materialize while cached
      out
    } finally rev.unpersist(blocking = false)
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "s17_text_file" -> s17TextFile,
    "x14_cache_reuse" -> x14CacheReuse)

  val oracleSql: Map[String, String] = Map(
    "s17_text_file" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(text)) AS BIGINT) AS sum_len,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "x14_cache_reuse" ->
      """WITH rev AS (
        |  SELECT n_regionkey, n_name,
        |    CAST(sum(CAST(floor(o_totalprice * 1e4 + 5e-1) AS BIGINT)) AS BIGINT)
        |      AS qrev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_regionkey, n_name),
        |tops AS (
        |  SELECT n_regionkey AS rk, CAST(max(qrev) AS BIGINT) AS top_qrev
        |  FROM rev GROUP BY n_regionkey)
        |SELECT n_regionkey, n_name,
        |  round(CAST(qrev AS DOUBLE) / 1e4, 4) AS revenue,
        |  qrev = top_qrev AS is_region_top
        |FROM rev JOIN tops ON n_regionkey = rk
        |ORDER BY n_regionkey, n_name""".stripMargin)
}
