package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent
  * SQL for every oracle-checkable entry; `benchQueries` names the headline
  * subset whose shapes mirror BASELINE.md q1..q9 so bench numbers stay
  * comparable round over round.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_scan_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.WindowsFuncs.queries ++
      graft.queries.TimeJson.queries ++
      graft.queries.LlmOps.queries ++
      graft.queries.MlQueries.queries ++
      graft.queries.StreamingQueries.queries ++
      graft.queries.Hardening.queries ++
      graft.queries.PipelineOps.queries ++
      graft.queries.SurfaceR5.queries ++
      graft.queries.SurfaceR5b.queries ++
      graft.queries.SurfaceR6.queries ++
      graft.queries.SurfaceR6b.queries ++
      graft.queries.SurfaceR6c.queries ++
      graft.queries.SurfaceR6d.queries ++
      graft.queries.SurfaceR6e.queries ++
      graft.queries.SurfaceR6f.queries ++
      graft.queries.SurfaceR6g.queries ++
      graft.queries.SurfaceR6h.queries ++
      graft.queries.SurfaceR6i.queries ++
      graft.queries.SurfaceR6j.queries ++
      graft.queries.SurfaceR6k.queries ++
      graft.queries.SurfaceR6l.queries ++
      graft.queries.SurfaceR6m.queries ++
      graft.queries.SurfaceR6n.queries ++
      graft.queries.SurfaceR6o.queries ++
      graft.queries.SurfaceR6p.queries ++
      graft.queries.SurfaceR8.queries ++
      graft.queries.SurfaceR8b.queries ++
      graft.queries.SurfaceR8c.queries ++
      graft.queries.SurfaceR8d.queries ++
      graft.queries.SurfaceR8e.queries ++
      graft.queries.SurfaceR8f.queries ++
      graft.queries.SurfaceR8g.queries ++
      graft.queries.SurfaceR8h.queries ++
      graft.queries.SurfaceR8i.queries ++
      graft.queries.SurfaceR8j.queries ++
      graft.queries.SurfaceR8k.queries ++
      graft.queries.SurfaceR8l.queries ++
      graft.queries.SurfaceR8m.queries ++
      graft.queries.SurfaceR8n.queries ++
      graft.queries.SurfaceR9.queries ++
      graft.queries.SurfaceR10.queries ++
      graft.queries.SurfaceR10b.queries ++
      graft.queries.SurfaceR10c.queries ++
      graft.queries.SurfaceR10d.queries ++
      graft.queries.SurfaceR10e.queries ++
      graft.queries.SurfaceR10f.queries ++
      graft.queries.SurfaceR10g.queries ++
      graft.queries.SurfaceR10h.queries ++
      graft.queries.SurfaceR10i.queries ++
      graft.queries.SurfaceR10j.queries ++
      graft.queries.SurfaceR10k.queries ++
      graft.queries.SurfaceR10l.queries ++
      graft.queries.SurfaceR10m.queries ++
      graft.queries.SurfaceR10n.queries ++
      graft.queries.SurfaceR10o.queries ++
      graft.queries.SurfaceR10p.queries ++
      graft.queries.SurfaceR10q.queries ++
      graft.queries.SurfaceR10r.queries ++
      graft.queries.SurfaceR10s.queries ++
      graft.queries.SurfaceR10t.queries ++
      graft.queries.SurfaceR10u.queries ++
      graft.queries.SurfaceR10v.queries ++
      graft.queries.SurfaceR10w.queries ++
      graft.queries.SurfaceR10x.queries ++
      graft.queries.SurfaceR10y.queries ++
      graft.queries.SurfaceR10z.queries ++
      graft.queries.SurfaceR10aa.queries ++
      graft.queries.SurfaceR10ab.queries ++
      graft.queries.SurfaceR10ac.queries ++
      graft.queries.SurfaceR10ad.queries ++
      graft.queries.SurfaceR10ae.queries ++
      graft.queries.SurfaceR10af.queries ++
      graft.queries.SurfaceR10ag.queries ++
      graft.queries.SurfaceR10ah.queries ++
      graft.queries.SurfaceR10ai.queries ++
      graft.queries.SurfaceR10aj.queries ++
      graft.queries.SurfaceR10ak.queries ++
      graft.queries.SurfaceR10al.queries ++
      graft.queries.SurfaceR10am.queries ++
      graft.queries.SurfaceR10an.queries ++
      graft.queries.SurfaceR10ao.queries ++
      graft.queries.SurfaceR10ap.queries ++
      graft.queries.SurfaceR10aq.queries ++
      graft.queries.SurfaceR10ar.queries ++
      graft.queries.SurfaceR10as.queries ++
      graft.queries.SurfaceR10at.queries ++
      graft.queries.SurfaceR10au.queries ++
      graft.queries.SurfaceR10av.queries ++
      graft.queries.SurfaceR10aw.queries ++
      graft.queries.SurfaceR10ax.queries ++
      graft.queries.SurfaceR10ay.queries ++
      graft.queries.SurfaceR10az.queries ++
      graft.queries.SurfaceR10ba.queries ++
      graft.queries.SurfaceR10bb.queries ++
      graft.queries.SurfaceR10bc.queries ++
      graft.queries.SurfaceR10bd.queries ++
      graft.queries.SurfaceR10be.queries ++
      graft.queries.SurfaceR10bf.queries ++
      graft.queries.SurfaceR10bg.queries ++
      graft.queries.SurfaceR10bh.queries ++
      graft.queries.SurfaceR10bi.queries ++
      graft.queries.SurfaceR10bj.queries ++
      graft.queries.SurfaceR10bk.queries ++
      graft.queries.SurfaceR10bl.queries ++
      graft.queries.SurfaceR10bm.queries ++
      graft.queries.SurfaceR10bn.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * Every `round(E, 4)` is mechanically rewritten to the floor-based
    * IEEE op sequence `Orc.r4` emits on the Spark side (SURVEY §5.3:
    * "enforced mechanically, not by convention"). */
  def oracleSql: Map[String, String] =
    (graft.queries.Relational.oracleSql ++
      graft.queries.WindowsFuncs.oracleSql ++
      graft.queries.TimeJson.oracleSql ++
      graft.queries.LlmOps.oracleSql ++
      graft.queries.MlQueries.oracleSql ++
      graft.queries.StreamingQueries.oracleSql ++
      graft.queries.Hardening.oracleSql ++
      graft.queries.PipelineOps.oracleSql ++
      graft.queries.SurfaceR5.oracleSql ++
      graft.queries.SurfaceR5b.oracleSql ++
      graft.queries.SurfaceR6.oracleSql ++
      graft.queries.SurfaceR6b.oracleSql ++
      graft.queries.SurfaceR6c.oracleSql ++
      graft.queries.SurfaceR6d.oracleSql ++
      graft.queries.SurfaceR6e.oracleSql ++
      graft.queries.SurfaceR6f.oracleSql ++
      graft.queries.SurfaceR6g.oracleSql ++
      graft.queries.SurfaceR6h.oracleSql ++
      graft.queries.SurfaceR6i.oracleSql ++
      graft.queries.SurfaceR6j.oracleSql ++
      graft.queries.SurfaceR6k.oracleSql ++
      graft.queries.SurfaceR6l.oracleSql ++
      graft.queries.SurfaceR6m.oracleSql ++
      graft.queries.SurfaceR6n.oracleSql ++
      graft.queries.SurfaceR6o.oracleSql ++
      graft.queries.SurfaceR6p.oracleSql ++
      graft.queries.SurfaceR8.oracleSql ++
      graft.queries.SurfaceR8b.oracleSql ++
      graft.queries.SurfaceR8c.oracleSql ++
      graft.queries.SurfaceR8d.oracleSql ++
      graft.queries.SurfaceR8e.oracleSql ++
      graft.queries.SurfaceR8f.oracleSql ++
      graft.queries.SurfaceR8g.oracleSql ++
      graft.queries.SurfaceR8h.oracleSql ++
      graft.queries.SurfaceR8i.oracleSql ++
      graft.queries.SurfaceR8j.oracleSql ++
      graft.queries.SurfaceR8k.oracleSql ++
      graft.queries.SurfaceR8l.oracleSql ++
      graft.queries.SurfaceR8m.oracleSql ++
      graft.queries.SurfaceR8n.oracleSql ++
      graft.queries.SurfaceR9.oracleSql ++
      graft.queries.SurfaceR10.oracleSql ++
      graft.queries.SurfaceR10b.oracleSql ++
      graft.queries.SurfaceR10c.oracleSql ++
      graft.queries.SurfaceR10d.oracleSql ++
      graft.queries.SurfaceR10e.oracleSql ++
      graft.queries.SurfaceR10f.oracleSql ++
      graft.queries.SurfaceR10g.oracleSql ++
      graft.queries.SurfaceR10h.oracleSql ++
      graft.queries.SurfaceR10i.oracleSql ++
      graft.queries.SurfaceR10j.oracleSql ++
      graft.queries.SurfaceR10k.oracleSql ++
      graft.queries.SurfaceR10l.oracleSql ++
      graft.queries.SurfaceR10m.oracleSql ++
      graft.queries.SurfaceR10n.oracleSql ++
      graft.queries.SurfaceR10o.oracleSql ++
      graft.queries.SurfaceR10p.oracleSql ++
      graft.queries.SurfaceR10q.oracleSql ++
      graft.queries.SurfaceR10r.oracleSql ++
      graft.queries.SurfaceR10s.oracleSql ++
      graft.queries.SurfaceR10t.oracleSql ++
      graft.queries.SurfaceR10u.oracleSql ++
      graft.queries.SurfaceR10v.oracleSql ++
      graft.queries.SurfaceR10w.oracleSql ++
      graft.queries.SurfaceR10x.oracleSql ++
      graft.queries.SurfaceR10y.oracleSql ++
      graft.queries.SurfaceR10z.oracleSql ++
      graft.queries.SurfaceR10aa.oracleSql ++
      graft.queries.SurfaceR10ab.oracleSql ++
      graft.queries.SurfaceR10ac.oracleSql ++
      graft.queries.SurfaceR10ad.oracleSql ++
      graft.queries.SurfaceR10ae.oracleSql ++
      graft.queries.SurfaceR10af.oracleSql ++
      graft.queries.SurfaceR10ag.oracleSql ++
      graft.queries.SurfaceR10ah.oracleSql ++
      graft.queries.SurfaceR10ai.oracleSql ++
      graft.queries.SurfaceR10aj.oracleSql ++
      graft.queries.SurfaceR10ak.oracleSql ++
      graft.queries.SurfaceR10al.oracleSql ++
      graft.queries.SurfaceR10am.oracleSql ++
      graft.queries.SurfaceR10an.oracleSql ++
      graft.queries.SurfaceR10ao.oracleSql ++
      graft.queries.SurfaceR10ap.oracleSql ++
      graft.queries.SurfaceR10aq.oracleSql ++
      graft.queries.SurfaceR10ar.oracleSql ++
      graft.queries.SurfaceR10as.oracleSql ++
      graft.queries.SurfaceR10at.oracleSql ++
      graft.queries.SurfaceR10au.oracleSql ++
      graft.queries.SurfaceR10av.oracleSql ++
      graft.queries.SurfaceR10aw.oracleSql ++
      graft.queries.SurfaceR10ax.oracleSql ++
      graft.queries.SurfaceR10ay.oracleSql ++
      graft.queries.SurfaceR10az.oracleSql ++
      graft.queries.SurfaceR10ba.oracleSql ++
      graft.queries.SurfaceR10bb.oracleSql ++
      graft.queries.SurfaceR10bc.oracleSql ++
      graft.queries.SurfaceR10bd.oracleSql ++
      graft.queries.SurfaceR10be.oracleSql ++
      graft.queries.SurfaceR10bf.oracleSql ++
      graft.queries.SurfaceR10bg.oracleSql ++
      graft.queries.SurfaceR10bh.oracleSql ++
      graft.queries.SurfaceR10bi.oracleSql ++
      graft.queries.SurfaceR10bj.oracleSql ++
      graft.queries.SurfaceR10bk.oracleSql ++
      graft.queries.SurfaceR10bl.oracleSql ++
      graft.queries.SurfaceR10bm.oracleSql ++
      graft.queries.SurfaceR10bn.oracleSql)
      .map { case (k, v) => k -> Orc.round4Sql(v) }

  /** Headline bench subset — names and shapes match BASELINE.md. */
  def benchQueries: Seq[String] = Seq(
    "q1_scan_agg", "q2_join3", "q3_window_topk", "q4_anti_join",
    "q5_rollup", "q6_event_window_json", "q7_sort_limit", "q8_dedup",
    "q9_cosine_selfjoin")
}
