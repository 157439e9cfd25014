package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 54: lexical diversity — mean segmental
  * type-token ratio (MSTTR). Plain TTR collapses as documents grow
  * (Heaps' law, lt26), so corpus linguists measure diversity on
  * fixed-size windows and average: MSTTR-100 is the standard form
  * (this corpus tops out at 99 tokens/doc, so the window is 25).
  * Completes the diversity family lt26 (vocab growth) / lt31 (char
  * entropy) / l12 (repetition) with the windowed-type measure.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2.12 (text quality).
  */
object SurfaceR10bb extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** LT41: MSTTR-25 — tokens get their in-document ordinal from
    * posexplode (no window at all), segments are ordinal÷25, each
    * FULL segment's TTR = distinct types / 25 (exact integers;
    * partial tail segments dropped — the standard convention, stated),
    * and sources average their segments' TTRs. Everything before the
    * final division is a hash aggregate over (doc, segment) — narrow,
    * shuffle-minimal, embarrassingly scale-stable. */
  val lt41Msttr: Q = (s, d) => {
    val toks = documents(s, d)
      .select(col("source"), col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("source"), col("doc_id"),
        (col("pos") / 25).cast("long").as("seg"), col("pos"), col("tok"))
    val segSizes = toks.groupBy("source", "doc_id", "seg")
      .agg(count(lit(1)).as("n_tok"))
    val segTypes = toks.select("source", "doc_id", "seg", "tok").distinct()
      .groupBy("source", "doc_id", "seg")
      .agg(count(lit(1)).as("n_typ"))
    segSizes.join(segTypes, Seq("source", "doc_id", "seg"))
      .where(col("n_tok") === 25)
      .groupBy("source")
      .agg(count(lit(1)).as("n_segments"),
        sum("n_typ").as("sum_types"))
      .select(col("source"), col("n_segments"),
        r4(expr("CAST(sum_types AS DOUBLE) / (25.0 * n_segments)"))
          .as("msttr"))
      .orderBy("source")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt41_msttr" -> lt41Msttr)

  val oracleSql: Map[String, String] = Map(
    "lt41_msttr" ->
      """WITH words AS (
        |  SELECT source, doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |toks AS (
        |  SELECT source, doc_id,
        |    CAST(floor((g.i - 1) / 25.0) AS BIGINT) AS seg,
        |    w[g.i] AS tok
        |  FROM words, LATERAL unnest(generate_series(1, len(w))) AS g(i)),
        |sizes AS (
        |  SELECT source, doc_id, seg, CAST(count(*) AS BIGINT) AS n_tok
        |  FROM toks GROUP BY 1, 2, 3),
        |types AS (
        |  SELECT source, doc_id, seg,
        |    CAST(count(DISTINCT tok) AS BIGINT) AS n_typ
        |  FROM toks GROUP BY 1, 2, 3),
        |seg100 AS (
        |  SELECT s.source, t.n_typ
        |  FROM sizes s JOIN types t
        |    ON t.source = s.source AND t.doc_id = s.doc_id AND t.seg = s.seg
        |  WHERE s.n_tok = 25)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_segments,
        |  round(CAST(sum(n_typ) AS DOUBLE) / (25.0 * count(*)), 4) AS msttr
        |FROM seg100 GROUP BY 1 ORDER BY 1""".stripMargin)
}
