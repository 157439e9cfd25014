package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{Orc, Tables}

/** Round-12 surface batch 2: the processing-time trigger (the one
  * streaming execution mode the trigger matrix still lacked — VERDICT
  * r11 "What's missing" #4) and the Theil–Sen robust trend estimator.
  *
  * Contrast with near-siblings: t16 drains with Trigger.AvailableNow
  * (process-everything-then-STOP, the backfill schedule); t25 runs the
  * SAME source on Trigger.ProcessingTime — the steady-state production
  * cadence where the engine re-fires on a wall-clock period and an
  * external condition decides when to stop. lt77's Theta trend is OLS —
  * one far outlier drags it arbitrarily; lt78's Theil–Sen slope is the
  * MEDIAN of all pairwise slopes (breakdown point 29%), the robust
  * complement, exactly as m28 MAD complements mean/stddev fences.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.9 (streaming triggers), §2.13 (time series).
  */
object SurfaceR12b extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- T25: processing-time trigger ----

  /** T25: micro-batch cadence on Trigger.ProcessingTime(250 ms) over a
    * rate-limited file source (maxFilesPerTrigger=2 forces several
    * batches), complete-mode aggregate into a memory sink. Unlike
    * AvailableNow the query never self-terminates, so the harness stops
    * it from outside once the sink's doc count reaches the known input
    * total — the production pattern (external stop signal) in
    * miniature. The final snapshot must equal the batch aggregate over
    * the same files, which is exactly what the oracle checks; a
    * trigger that dropped or double-counted a micro-batch fails the
    * hash. */
  val t25ProcessingTime: Q = (s, d) => {
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val dirFile = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_t25_landing_$runId")
    val dir = dirFile.getAbsolutePath
    // ADVICE r12: register cleanup BEFORE any throw site — the deadline
    // IllegalStateException used to leak the landing dir and the sink
    // temp view into the shared drive session (the s29/x21 idiom).
    graft.QueryGuard.deleteRecOnExit(dirFile)
    val sink = s"graft_t25_$runId"
    val src = documents(s, d).select(col("doc_id"), col("source"), col("n_chars"))
    src.write.mode("overwrite").parquet(dir)
    val expected = src.count()
    val stream = s.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
    val q = stream.writeStream.format("memory").queryName(sink)
      .outputMode("complete")
      .trigger(Trigger.ProcessingTime("250 milliseconds")).start()
    try {
      // external stop condition: poll the sink until the complete-mode
      // snapshot covers the full input, bounded by a deadline so a wedged
      // stream fails THIS query rather than hanging the drive
      val deadline = System.nanoTime() + 120L * 1000000000L
      var caughtUp = false
      while (!caughtUp && System.nanoTime() < deadline) {
        Thread.sleep(200L)
        val got = s.table(sink).select(sum("n_docs")).collect()(0)
        caughtUp = !got.isNullAt(0) && got.getLong(0) == expected
      }
      q.stop()
      q.awaitTermination(30000L)
      if (!caughtUp)
        throw new IllegalStateException(
          s"t25 processing-time stream did not cover $expected docs in 120s")
      val out = s.table(sink).orderBy("source").collect().toSeq
      val schema = s.table(sink).schema
      s.createDataFrame(s.sparkContext.parallelize(out, 1), schema).orderBy("source")
    } finally {
      if (q.isActive) q.stop()
      s.catalog.dropTempView(sink)
      graft.QueryGuard.deleteRec(dirFile)
    }
  }

  // ---- LT78: Theil–Sen robust trend ----

  /** LT78: THEIL–SEN SLOPE per event type's daily-mean series — the
    * median of all pairwise slopes (qv_j − qv_i)/((j − i)·1e6) over day
    * ordinals i < j. Daily means ride the lt77 quantize-before-sum
    * discipline (exact-integer qv), every pairwise slope is ONE shared
    * double expression, and the median goes through the r8→r4 readout
    * (binary-exact 0.5 fraction — the m28 percentile pairing).
    *
    * Scale shape: the pair join is per-event-type over the DAILY table,
    * which is calendar-bounded (≈30 days × #types on the fixtures;
    * days × types at any corpus size — never corpus-row-scaled), so the
    * O(n²) pair set is a bounded panel by construction; the distributed
    * pass is the daily pre-aggregation, same as lt69/lt77. */
  val lt78TheilSen: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("CAST(floor(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))" +
        " AS DOUBLE) / count(*) + 0.5) AS BIGINT)").as("qv"))
    val idx = daily.select(col("event_type"), col("qv"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")).cast("long").as("j"))
    val a = idx.toDF("event_type", "qa", "ja")
    val b = idx.toDF("event_type", "qb", "jb")
    a.join(b, Seq("event_type")).where(col("jb") > col("ja"))
      .select(col("event_type"),
        (((col("qb") - col("qa")).cast("double")) /
          ((col("jb") - col("ja")) * lit(1000000.0))).as("slope"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        Orc.rN(expr("percentile(slope, 0.5D)"), 8).as("m8"))
      .select(col("event_type"), col("n_pairs"), r4(col("m8")).as("ts_slope"))
      .orderBy("event_type")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "t25_processing_time" -> t25ProcessingTime,
    "lt78_theil_sen" -> lt78TheilSen)

  val oracleSql: Map[String, String] = Map(
    "t25_processing_time" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "lt78_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    CAST(floor(CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
        |      AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS qv
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, qv,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS BIGINT) AS j
        |  FROM daily),
        |pairs AS (
        |  SELECT a.event_type,
        |    CAST(b.qv - a.qv AS DOUBLE) / ((b.j - a.j) * 1000000.0) AS slope
        |  FROM idx a JOIN idx b
        |    ON a.event_type = b.event_type AND b.j > a.j)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |  round(round(quantile_cont(slope, 0.5), 8), 4) AS ts_slope
        |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin)
}
