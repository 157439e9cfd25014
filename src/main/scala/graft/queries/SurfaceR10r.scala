package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.{Orc, Tables}
import graft.streaming.StreamingOps

/** Round-10 surface batch 18: streaming drift monitoring + dataset
  * contamination matrix — the production-shaped composition rows:
  * a live PSI monitor over the event stream (streaming window agg ×
  * the m35/lp25 drift family) and the source×source shingle-overlap
  * matrix (the l13 contamination check generalized from "corpus vs
  * benchmark" to "every pair of ingest feeds").
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.9 (streaming), §2.11–§2.12 (LLM pipeline).
  */
object SurfaceR10r extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- T20: streaming PSI drift monitor ----

  private val binSql =
    "CAST(least(9, greatest(0, CAST(floor(value / 50.0) AS INT))) AS INT)"
  private val pwSql = "(CAST(cw + 1 AS DOUBLE) / (nw + 10))"
  private val prSql = "(CAST(cref + 1 AS DOUBLE) / (nref + 10))"
  private val psiTermSql = s"(($pwSql - $prSql) * ln($pwSql / $prSql))"

  /** T20: STREAMING PSI DRIFT — the live twin of m35: the event stream
    * aggregates to (1-day tumbling window × value bin) counts through
    * the real micro-batch engine, then each window's distribution is
    * scored against the full-corpus reference histogram with add-one
    * smoothed PSI; windows over 0.2 are flagged. This is the shape of
    * a production feature-drift monitor: the streaming side is ONLY
    * the windowed count agg (tiny state, watermark-evictable), all
    * scoring happens on the bounded (windows × bins) sink. Exact
    * integer counts; the PSI closed form is one shared text. */
  val t20StreamPsiDrift: Q = (s, d) => {
    val ref = events(s, d)
      .select(expr(binSql).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cref"))
    val refTot = ref.agg(sum("cref").as("nref"))
    val stream = StreamingOps.eventsStream(s, d)
      .withColumn("bin", expr(binSql))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("bin"))
      .agg(count(lit(1)).as("cw"))
      .select(unix_timestamp(col("window.start")).as("win_start_s"),
        col("bin"), col("cw"))
    // snapshot: the memory-sink VIEW cannot be self-joined (MemoryPlan
    // does not deduplicate attribute refs); a localCheckpoint turns it
    // into a plain relation the grid/total subtrees can both consume
    val sink = StreamingOps.runToMemory(stream, "t20_sink",
      OutputMode.Complete()).localCheckpoint(true)
    val grid = sink.select("win_start_s").distinct()
      .crossJoin(broadcast(ref))
    val winTot = sink.groupBy("win_start_s").agg(sum("cw").as("nw"))
    grid.join(sink, Seq("win_start_s", "bin"), "left")
      .na.fill(0L, Seq("cw"))
      .join(broadcast(winTot), "win_start_s")
      .crossJoin(broadcast(refTot))
      .groupBy("win_start_s")
      .agg(first("nw").as("n_events"), sum(expr(psiTermSql)).as("psi_raw"))
      .select(col("win_start_s"), col("n_events"),
        r4(col("psi_raw")).as("psi"),
        (col("psi_raw") > 0.2).as("flagged"))
      .orderBy("win_start_s")
  }

  // ---- LT27: source-overlap contamination matrix ----

  private val ovSql = "(CAST(n_common AS DOUBLE) / least(ta, tb))"

  /** LT27: SOURCE OVERLAP MATRIX — for every pair of ingest sources,
    * the containment of their distinct 3-gram shingle sets
    * (|A∩B| / min(|A|,|B|)). l13 answers "is the benchmark leaking
    * into the corpus"; this answers "which feeds are mirrors of each
    * other" — the first question asked before assigning dedup priority
    * across crawls. The pair counts come from ONE equi-join keyed by
    * shingle (the same key l2b bands on), so candidate generation is
    * shingle-local — never a source×source×doc blow-up; at the 100 TB
    * tier the ultra-common shingles get the ls3 relative stop-term
    * prune, which only removes ties both sides already share. */
  val lt27SourceOverlap: Q = (s, d) => {
    val sh = documents(s, d)
      .withColumn("tk", split(col("text"), " "))
      .where(size(col("tk")) >= 3)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(tk) - 3), " +
          "i -> concat_ws(' ', tk[i], tk[i + 1], tk[i + 2]))")).as("sh"))
      .distinct()
    val tot = sh.groupBy("source").agg(count(lit(1)).as("t"))
    val common = sh.select(col("source").as("sa"), col("sh"))
      .join(sh.select(col("source").as("sb"), col("sh")), "sh")
      .where(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(tot.select(col("source").as("sa"), col("t").as("ta"))), "sa")
      .join(broadcast(tot.select(col("source").as("sb"), col("t").as("tb"))), "sb")
      .select(col("sa"), col("sb"), col("n_common"),
        r4(expr(ovSql)).as("containment"))
      .orderBy("sa", "sb")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "t20_stream_psi_drift" -> t20StreamPsiDrift,
    "lt27_source_overlap" -> lt27SourceOverlap)

  val oracleSql: Map[String, String] = Map(
    "t20_stream_psi_drift" ->
      s"""WITH binned AS (
        |  SELECT CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT)
        |      AS win_start_s,
        |    $binSql AS bin
        |  FROM events),
        |ref AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS cref
        |  FROM (SELECT $binSql AS bin FROM events) GROUP BY bin),
        |ref_tot AS (SELECT CAST(sum(cref) AS BIGINT) AS nref FROM ref),
        |wb AS (
        |  SELECT win_start_s, bin, CAST(count(*) AS BIGINT) AS cw
        |  FROM binned GROUP BY 1, 2),
        |win_tot AS (
        |  SELECT win_start_s, CAST(sum(cw) AS BIGINT) AS nw
        |  FROM wb GROUP BY 1),
        |grid AS (
        |  SELECT w.win_start_s, r.bin, r.cref,
        |    coalesce(wb.cw, CAST(0 AS BIGINT)) AS cw
        |  FROM (SELECT DISTINCT win_start_s FROM wb) w
        |  CROSS JOIN ref r
        |  LEFT JOIN wb ON wb.win_start_s = w.win_start_s AND wb.bin = r.bin)
        |SELECT win_start_s, any_value(nw) AS n_events,
        |  round(sum($psiTermSql), 4) AS psi,
        |  sum($psiTermSql) > 0.2 AS flagged
        |FROM grid
        |JOIN win_tot USING (win_start_s)
        |CROSS JOIN ref_tot
        |GROUP BY win_start_s
        |ORDER BY win_start_s""".stripMargin,
    "lt27_source_overlap" ->
      s"""WITH sh AS (
        |  SELECT DISTINCT source, sh FROM (
        |    SELECT source, unnest(list_transform(range(len(tk) - 2),
        |      i -> tk[CAST(i + 1 AS INT)] || ' ' || tk[CAST(i + 2 AS INT)]
        |           || ' ' || tk[CAST(i + 3 AS INT)])) AS sh
        |    FROM (SELECT source, string_split(text, ' ') AS tk FROM documents
        |          WHERE len(string_split(text, ' ')) >= 3))),
        |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS t
        |        FROM sh GROUP BY source),
        |common AS (
        |  SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS n_common
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT sa, sb, n_common, round($ovSql, 4) AS containment
        |FROM common
        |JOIN (SELECT source AS sa, t AS ta FROM tot) USING (sa)
        |JOIN (SELECT source AS sb, t AS tb FROM tot) USING (sb)
        |ORDER BY sa, sb""".stripMargin)
}
