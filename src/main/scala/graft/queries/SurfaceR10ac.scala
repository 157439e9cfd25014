package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Orc, Tables}

/** Round-10 surface batch 29: forecast backtesting + storage chunking —
  * walk-forward MAE/MAPE of the lt17 Holt model (the backtest number
  * that justifies a forecast), and content-defined chunking statistics
  * (the Rabin-style boundary scheme that makes storage dedup robust to
  * insertions, reported per document).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.12–§2.13.
  */
object SurfaceR10ac extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M103: Holt walk-forward backtest ----

  /** M103: FORECAST BACKTEST — the lt17 Holt fold extended with error
    * accumulators: at each day the PRIOR (level+trend) is the 1-step
    * forecast, scored against the day's actual before the state
    * updates; MAE and MAPE divide by the n−1 scored days. This is the
    * walk-forward evaluation a forecast needs before anyone trusts
    * lt17's forecast_1. Same cross-engine fold discipline as lt17:
    * every compound subexpression appears EXACTLY ONCE in the lambda
    * (DuckDB's lambda CSE mis-evaluates repeated compound struct-field
    * expressions — lt17's documented trap), and the daily series is
    * bounded by calendar × types. */
  val m103ForecastBacktest: Q = (s, d) => {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(avg("value").as("v"))
    daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("v")))).as("sv"),
        count(lit(1)).as("n_days"))
      .select(col("event_type"), col("n_days"),
        expr("""aggregate(sv,
          named_struct('l', cast(0.0 as double), 't', cast(0.0 as double),
                       'i', 0, 'mae', cast(0.0 as double),
                       'mpe', cast(0.0 as double)),
          (acc, x) -> CASE WHEN acc.i = 0
            THEN named_struct('l', x.v, 't', cast(0.0 as double), 'i', 1,
                              'mae', cast(0.0 as double),
                              'mpe', cast(0.0 as double))
            ELSE named_struct(
              'l', 0.5 * x.v + 0.5 * (acc.l + acc.t),
              't', 0.15 * x.v - 0.15 * acc.l + 0.85 * acc.t,
              'i', acc.i + 1,
              'mae', acc.mae + abs(x.v - acc.l - acc.t),
              'mpe', acc.mpe + abs(1.0 - (acc.t + acc.l) / x.v)) END)""")
          .as("h"))
      .select(col("event_type"), col("n_days"),
        r4(expr("h.mae / (h.i - 1)")).as("mae"),
        r4(expr("h.mpe / (h.i - 1)")).as("mape"))
      .orderBy("event_type")
  }

  // ---- LP47: content-defined chunking ----

  /** LP47: CDC STATS — content-defined chunk boundaries: a token opens
    * a new chunk when its md5 byte ≡ 0 (mod 8), expected chunk ≈ 8
    * tokens. Unlike lp8's fixed-size chunks, CDC boundaries are a pure
    * function of LOCAL content, so an insertion re-chunks only its
    * neighborhood — the property that lets a storage layer dedup
    * shifted copies (the rsync/LBFS trick). Reported per document:
    * chunk count, mean and max chunk length. Index-explode + one
    * per-doc window (partitioned by doc — bounded frames), exact
    * counts. */
  val lp47CdcChunking: Q = (s, d) => {
    val bSql =
      "(((instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16 + " +
        "(instr('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)) % 8)"
    val toks = documents(s, d)
      .withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("i", "tok")))
      .withColumn("flag", when(expr(bSql) === 0, 1L).otherwise(0L))
    val w = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.withColumn("chunk", sum("flag").over(w))
      .groupBy("doc_id", "chunk").agg(count(lit(1)).as("len"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("len").as("n_tokens"),
        max("len").as("max_len"))
      .select(col("doc_id"), col("n_chunks"), col("n_tokens"), col("max_len"),
        r4(expr("CAST(n_tokens AS DOUBLE) / n_chunks")).as("mean_len"))
      .orderBy("doc_id")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m103_forecast_backtest" -> m103ForecastBacktest,
    "lp47_cdc_chunking" -> lp47CdcChunking)

  val oracleSql: Map[String, String] = Map(
    // same walk-forward recursion as lt17's oracle (recursive CTE, not
    // a DuckDB lambda — the lambda CSE trap lt17 documents), extended
    // with the two error accumulators; update-arithmetic text matches
    // the Spark fold op for op
    "m103_forecast_backtest" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |    avg(value) AS v
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS INT) AS j,
        |    CAST(v AS DOUBLE) AS v
        |  FROM daily),
        |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
        |       FROM idx GROUP BY 1),
        |rec AS (
        |  SELECT event_type, j, v AS l, CAST(0.0 AS DOUBLE) AS t,
        |    CAST(0.0 AS DOUBLE) AS mae, CAST(0.0 AS DOUBLE) AS mpe
        |  FROM idx WHERE j = 1
        |  UNION ALL
        |  SELECT i.event_type, i.j,
        |    0.5 * i.v + 0.5 * (r.l + r.t),
        |    0.15 * i.v - 0.15 * r.l + 0.85 * r.t,
        |    r.mae + abs(i.v - r.l - r.t),
        |    r.mpe + abs(1.0 - (r.t + r.l) / i.v)
        |  FROM rec r JOIN idx i ON i.event_type = r.event_type AND i.j = r.j + 1),
        |fin AS (
        |  SELECT event_type, max(j) AS nj,
        |    max_by(mae, j) AS mae, max_by(mpe, j) AS mpe
        |  FROM rec GROUP BY 1)
        |SELECT f.event_type, n.n_days,
        |  round(f.mae / (f.nj - 1), 4) AS mae,
        |  round(f.mpe / (f.nj - 1), 4) AS mape
        |FROM fin f JOIN nd n USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "lp47_cdc_chunking" ->
      """WITH toks AS (
        |  SELECT doc_id, CAST(i AS INT) AS i, tk[CAST(i AS INT)] AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS tk,
        |          unnest(range(1, len(string_split(text, ' ')) + 1)) AS i
        |        FROM documents)),
        |flagged AS (
        |  SELECT doc_id, i,
        |    CASE WHEN (((instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 16 +
        |               (instr('0123456789abcdef', substr(md5(tok), 2, 1)) - 1)) % 8) = 0
        |         THEN 1 ELSE 0 END AS flag
        |  FROM toks),
        |chunked AS (
        |  SELECT doc_id,
        |    sum(flag) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk
        |  FROM flagged),
        |per_chunk AS (
        |  SELECT doc_id, chunk, CAST(count(*) AS BIGINT) AS len
        |  FROM chunked GROUP BY 1, 2),
        |per_doc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |    CAST(sum(len) AS BIGINT) AS n_tokens,
        |    CAST(max(len) AS BIGINT) AS max_len
        |  FROM per_chunk GROUP BY doc_id)
        |SELECT doc_id, n_chunks, n_tokens, max_len,
        |  round(CAST(n_tokens AS DOUBLE) / n_chunks, 4) AS mean_len
        |FROM per_doc ORDER BY doc_id""".stripMargin)
}
