package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{Orc, Tables}

/** Round-6 wave 9: Trigger.AvailableNow bounded stream drain (the
  * catch-up/backfill execution mode) and map higher-order functions.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.10 (streaming), §2.8 (functions).
  */
object SurfaceR6l extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- T16: Trigger.AvailableNow ----

  /** T16: drain a landing directory with Trigger.AvailableNow — the
    * backfill mode that processes everything present, checkpoints in
    * rate-limited micro-batches, then STOPS. This is how a 100 TB
    * pipeline replays history through the same streaming query it runs
    * incrementally (one code path, two schedules). The drained aggregate
    * must equal the batch aggregate over the same files, which is
    * exactly what the oracle checks.
    */
  val t16AvailableNow: Q = (s, d) => {
    // unique tmpdir landing path + per-run sink name: CWD-relative paths
    // and a fixed memory-sink name collide across working directories or
    // concurrent drives sharing a JVM
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_t16_landing_$runId").getAbsolutePath
    val sink = s"graft_t16_$runId"
    val src = documents(s, d).select(col("doc_id"), col("lang"), col("n_chars"))
    src.write.mode("overwrite").parquet(dir)
    val stream = s.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 2) // force several micro-batches
      .parquet(dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
    val q = stream.writeStream.format("memory").queryName(sink)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    // bounded wait: an unbounded awaitTermination() is a driver-side
    // hang no job-group cancel can unblock — if the drain wedges, stop
    // the query and fail THIS query, not the whole drive
    if (!q.awaitTermination(180000L)) {
      q.stop()
      throw new IllegalStateException("t16 AvailableNow drain did not terminate in 180s")
    }
    // the drained aggregate is tiny (one row per lang), so localize it,
    // then drop the memory-sink table and the landing dir — repeated
    // drives must not accumulate orphan temp dirs / sink tables for the
    // JVM lifetime
    val out = s.table(sink).orderBy("lang").collect().toSeq
    val schema = s.table(sink).schema
    s.catalog.dropTempView(sink)
    graft.QueryGuard.deleteRec(new java.io.File(dir))
    s.createDataFrame(s.sparkContext.parallelize(out, 1), schema).orderBy("lang")
  }

  // ---- F26: map higher-order functions ----

  /** F26: map_from_arrays + transform_values + map_filter + explode —
    * the map-typed branch of the higher-order family (f7 covers arrays).
    * Maps stay row-local (narrow codegen'd projection); the oracle
    * reproduces the construct→transform→filter→flatten ladder
    * relationally, so the map machinery is hash-checked end to end. */
  val f26MapHof: Q = (s, d) =>
    documents(s, d)
      .withColumn("m", map_from_arrays(
        array(lit("chars"), lit("words")),
        array(col("n_chars").cast("long"),
          size(split(col("text"), " ")).cast("long"))))
      .withColumn("m2", expr("map_filter(transform_values(m, (k, v) -> v * 2), (k, v) -> v > 500)"))
      .select(col("doc_id"), explode(col("m2")).as(Seq("key", "value")))
      .orderBy("doc_id", "key")

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "t16_available_now" -> t16AvailableNow,
    "f26_map_hof" -> f26MapHof)

  val oracleSql: Map[String, String] = Map(
    "t16_available_now" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "f26_map_hof" ->
      """SELECT doc_id, key, value FROM (
        |  SELECT doc_id, 'chars' AS key, n_chars * 2 AS value FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'words' AS key,
        |    len(string_split(text, ' ')) * 2 AS value FROM documents)
        |WHERE value > 500
        |ORDER BY doc_id, key""".stripMargin)
}
