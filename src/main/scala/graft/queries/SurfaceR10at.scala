package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 46: forecast benchmarking + RAG chunking —
  * MASE (the scale-free "is this forecaster better than persistence"
  * number every forecasting paper reports) and overlapping
  * sliding-window chunk statistics (the retrieval-chunking cost model:
  * how much storage/compute does a stride buy).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 (time series), §2.12 (pipeline ops).
  */
object SurfaceR10at extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LT39: MASE of the seasonal-naive forecaster ----

  /** LT39: MASE — mean absolute error of the weekly-seasonal-naive
    * forecast (ŷ_t = y_{t−7}) scaled by the one-step persistence MAE
    * (ŷ_t = y_{t−1}) on the daily order-count series. MASE < 1 means
    * weekly seasonality genuinely predicts (it should here — order
    * volume has a weekday cycle); the errors are exact integer
    * |differences| off two lags of ONE bounded-series window pass, so
    * the ratio is bit-deterministic. The evaluation m103's Holt
    * backtest is measured AGAINST. */
  val lt39Mase: Q = (s, d) => {
    val daily = orders(s, d)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
    val w = graft.Windows.bounded(col("t"))
    daily
      .withColumn("yl1", lag(col("y"), 1).over(w))
      .withColumn("yl7", lag(col("y"), 7).over(w))
      .where(col("yl7").isNotNull)
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("y") - col("yl1"))).as("sn"),
        sum(abs(col("y") - col("yl7"))).as("ss"))
      .select(col("n_days"),
        r4(expr("CAST(sn AS DOUBLE) / n_days")).as("mae_naive"),
        r4(expr("CAST(ss AS DOUBLE) / n_days")).as("mae_seasonal"),
        r4(expr("CAST(ss AS DOUBLE) / sn")).as("mase"))
  }

  // ---- LP58: overlapping chunk statistics ----

  /** LP58: OVERLAPPING CHUNKS — slide a 200-char window with stride
    * 150 over each document (the RAG chunking default shape: 25%
    * overlap keeps sentences from being cut at retrieval boundaries)
    * and report per-doc chunk count, total emitted chars, and the
    * overlap overhead (emitted − original: exactly what the stride
    * costs in storage and embedding compute). One narrow explode of a
    * per-row integer sequence — embarrassingly parallel, no shuffle
    * except the per-doc re-agg; at 100 TB the chunker IS this plan
    * with the substring feeding an embedding UDF instead of length().
    * All outputs exact integers. */
  val lp58OverlappingChunks: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        explode(expr("sequence(1, greatest(n_chars, 1), 150)")).as("start"))
      .join(documents(s, d).select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("n_chars"),
        length(expr("substring(text, start, 200)")).cast("long").as("clen"))
      .groupBy("doc_id", "n_chars")
      .agg(count(lit(1)).as("n_chunks"), sum("clen").as("emitted_chars"))
      .select(col("doc_id"), col("n_chunks"), col("emitted_chars"),
        (col("emitted_chars") - col("n_chars")).as("overlap_chars"))
      .orderBy("doc_id")

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt39_mase" -> lt39Mase,
    "lp58_overlapping_chunks" -> lp58OverlappingChunks)

  val oracleSql: Map[String, String] = Map(
    "lt39_mase" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |lagged AS (
        |  SELECT y, lag(y, 1) OVER (ORDER BY t) AS yl1,
        |    lag(y, 7) OVER (ORDER BY t) AS yl7
        |  FROM daily),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(abs(y - yl1)) AS BIGINT) AS sn,
        |    CAST(sum(abs(y - yl7)) AS BIGINT) AS ss
        |  FROM lagged WHERE yl7 IS NOT NULL)
        |SELECT n_days,
        |  round(CAST(sn AS DOUBLE) / n_days, 4) AS mae_naive,
        |  round(CAST(ss AS DOUBLE) / n_days, 4) AS mae_seasonal,
        |  round(CAST(ss AS DOUBLE) / sn, 4) AS mase
        |FROM agg""".stripMargin,
    "lp58_overlapping_chunks" ->
      """WITH starts AS (
        |  SELECT doc_id, n_chars,
        |    unnest(generate_series(1, greatest(n_chars, 1), 150)) AS start
        |  FROM documents),
        |chunks AS (
        |  SELECT s.doc_id, s.n_chars,
        |    CAST(length(substring(d.text, CAST(s.start AS INT), 200)) AS BIGINT) AS clen
        |  FROM starts s JOIN documents d ON d.doc_id = s.doc_id),
        |agg AS (
        |  SELECT doc_id, n_chars, CAST(count(*) AS BIGINT) AS n_chunks,
        |    CAST(sum(clen) AS BIGINT) AS emitted_chars
        |  FROM chunks GROUP BY 1, 2)
        |SELECT doc_id, n_chunks, emitted_chars,
        |  emitted_chars - n_chars AS overlap_chars
        |FROM agg ORDER BY doc_id""".stripMargin)
}
