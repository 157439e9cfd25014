package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 23: corpus quality + inequality analytics —
  * per-document character entropy (the cheapest garbage detector),
  * the quality-decile × language curriculum mix report, and the Theil
  * inequality index with its within/between decomposition (the
  * property Gini lacks).
  *
  * Float discipline per SurfaceR10l: exact integer counts (money in
  * cents) into shared formula texts; the only per-row floats are ln()
  * on identical doubles.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.11–§2.13.
  */
object SurfaceR10w extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- LT31: per-document character entropy ----

  private val charEntTermSql =
    "(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n))"

  /** LT31: CHARACTER ENTROPY — Shannon entropy of the per-document
    * character distribution. Binary junk, base64 blobs, and repeated
    * filler all sit far from natural-text entropy (~4 bits/char), so
    * this single number is the first garbage gate a crawl pipeline
    * runs — cheaper than any tokenizer. Characters come from an index
    * explode (substr over a position range — the same text on both
    * engines, no split-on-empty-pattern dialect trap); counts exact,
    * one ln per (doc, char). */
  val lt31CharEntropy: Q = (s, d) => {
    val chars = documents(s, d)
      .where(length(col("text")) >= 1)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text)), i -> substr(text, i, 1))"))
        .as("ch"))
    val perChar = chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val perDoc = perChar.groupBy("doc_id").agg(sum("c").as("n"))
    perChar.join(perDoc, "doc_id")
      .groupBy("doc_id")
      .agg(first("n").as("n_chars"),
        count(lit(1)).as("n_distinct_chars"),
        sum(expr(charEntTermSql)).as("ent_raw"))
      .select(col("doc_id"), col("n_chars"), col("n_distinct_chars"),
        r4(col("ent_raw")).as("entropy_nats"))
      .orderBy("doc_id")
  }

  // ---- LP42: quality-decile curriculum mix ----

  /** LP42: CURRICULUM MIX — documents bucketed into quality deciles
    * (length as the stand-in score, decile breakpoints computed as
    * NINE broadcast scalars — the q41 window-free discipline), crossed
    * with language. The report a curriculum schedule is built from:
    * "phase 1 trains on deciles 8–10 — what languages does that
    * actually contain?" A skewed mix here means the quality filter is
    * secretly a language filter, the classic curation bug. */
  val lp42CurriculumMix: Q = (s, d) => {
    val docs = documents(s, d).select(col("lang"),
      col("n_chars").cast("long").as("q"))
    val bpExprs = (1 to 9).map(i => expr(s"percentile(q, 0.${i})").as(s"p$i"))
    val bp = docs.agg(bpExprs.head, bpExprs.tail: _*)
    docs.crossJoin(broadcast(bp))
      .withColumn("decile",
        (1 to 9).map(i => when(col("q") > col(s"p$i"), 1).otherwise(0))
          .reduce(_ + _) + lit(1))
      .groupBy("decile", "lang").agg(count(lit(1)).as("n_docs"))
      .orderBy("decile", "lang")
  }

  // ---- A36: Theil index decomposition ----

  private val theilTermSql =
    "((CAST(x AS DOUBLE) / mu) * ln(CAST(x AS DOUBLE) / mu) / n)"
  private val betweenTermSql =
    "((CAST(ng AS DOUBLE) / nn) * (mug / mu) * ln(mug / mu))"

  /** A36: THEIL DECOMPOSITION — the Theil T inequality index of order
    * totals by priority group: within-group indices, the between-group
    * component, and the total, which the spec pins to the exact
    * decomposition T = between + Σ (share_g · μ_g/μ) · T_g — the
    * property that makes Theil (not Gini, a33) the index used to
    * answer "is the inequality INSIDE segments or BETWEEN them".
    * Money snaps to cents; group means are exact-integer ratios; one
    * ln per row. Output: one row per group (n, mean, within) plus a
    * TOTAL row carrying total and between. */
  val a36TheilDecomposition: Q = (s, d) => {
    val rows = orders(s, d).select(col("o_orderpriority").as("grp"),
      floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("x"))
    val gstats = rows.groupBy("grp")
      .agg(count(lit(1)).as("ng"), sum("x").as("sg"))
      .withColumn("mug", expr("CAST(sg AS DOUBLE) / ng"))
    val tstats = gstats.agg(sum("ng").as("nn"), sum("sg").as("st"))
      .withColumn("mu", expr("CAST(st AS DOUBLE) / nn"))
    val within = rows.join(broadcast(gstats), "grp")
      .groupBy("grp")
      .agg(first("ng").as("n"), first("mug").as("mug_raw"),
        sum(expr(
          "((CAST(x AS DOUBLE) / mug) * ln(CAST(x AS DOUBLE) / mug) / ng)"))
          .as("t_within"))
      .select(col("grp"), col("n"),
        r4(expr("mug_raw / 100.0")).as("mean_price"),
        r4(col("t_within")).as("theil"))
    val total = rows.crossJoin(broadcast(tstats))
      .agg(first("nn").as("n"), first("mu").as("mu_raw"),
        sum(expr(
          "((CAST(x AS DOUBLE) / mu) * ln(CAST(x AS DOUBLE) / mu) / nn)"))
          .as("t_total"))
    val between = gstats.crossJoin(broadcast(tstats))
      .agg(sum(expr(betweenTermSql)).as("t_between"))
    val summary = total
      .select(lit("TOTAL").as("grp"), col("n"),
        r4(expr("mu_raw / 100.0")).as("mean_price"),
        r4(expr("t_total")).as("theil"))
    val betweenRow = between.crossJoin(broadcast(total))
      .select(lit("BETWEEN").as("grp"), col("n"),
        lit(null).cast("double").as("mean_price"),
        r4(col("t_between")).as("theil"))
    within.unionAll(summary).unionAll(betweenRow).orderBy("grp")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt31_char_entropy" -> lt31CharEntropy,
    "lp42_curriculum_mix" -> lp42CurriculumMix,
    "a36_theil_decomposition" -> a36TheilDecomposition)

  val oracleSql: Map[String, String] = Map(
    "lt31_char_entropy" ->
      s"""WITH chars AS (
        |  SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch
        |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        |        FROM documents WHERE length(text) >= 1)),
        |per_char AS (
        |  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        |  FROM chars GROUP BY 1, 2),
        |per_doc AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM per_char GROUP BY 1)
        |SELECT doc_id, any_value(n) AS n_chars,
        |  CAST(count(*) AS BIGINT) AS n_distinct_chars,
        |  round(sum($charEntTermSql), 4) AS entropy_nats
        |FROM per_char JOIN per_doc USING (doc_id)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "lp42_curriculum_mix" ->
      s"""WITH docs AS (
        |  SELECT lang, CAST(n_chars AS BIGINT) AS q FROM documents),
        |bp AS (
        |  SELECT ${(1 to 9).map(i => s"quantile_cont(q, 0.$i) AS p$i")
             .mkString(", ")}
        |  FROM docs)
        |SELECT ${(1 to 9).map(i => s"CASE WHEN q > p$i THEN 1 ELSE 0 END")
             .mkString("", " + ", " + 1")} AS decile,
        |  lang, CAST(count(*) AS BIGINT) AS n_docs
        |FROM docs CROSS JOIN bp
        |GROUP BY decile, lang
        |ORDER BY decile, lang""".stripMargin,
    "a36_theil_decomposition" ->
      s"""WITH rows_t AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x
        |  FROM orders),
        |gstats AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(x) AS BIGINT) AS sg,
        |    CAST(sum(x) AS DOUBLE) / count(*) AS mug
        |  FROM rows_t GROUP BY grp),
        |tstats AS (
        |  SELECT CAST(sum(ng) AS BIGINT) AS nn, CAST(sum(sg) AS BIGINT) AS st,
        |    CAST(sum(sg) AS DOUBLE) / sum(ng) AS mu
        |  FROM gstats),
        |within AS (
        |  SELECT grp, any_value(ng) AS n, any_value(mug) AS mug_raw,
        |    sum((CAST(x AS DOUBLE) / mug) * ln(CAST(x AS DOUBLE) / mug) / ng)
        |      AS t_within
        |  FROM rows_t JOIN gstats USING (grp)
        |  GROUP BY grp),
        |total AS (
        |  SELECT any_value(nn) AS n, any_value(mu) AS mu_raw,
        |    sum((CAST(x AS DOUBLE) / mu) * ln(CAST(x AS DOUBLE) / mu) / nn)
        |      AS t_total
        |  FROM rows_t CROSS JOIN tstats),
        |between_t AS (
        |  SELECT sum((CAST(ng AS DOUBLE) / nn) * (mug / mu) * ln(mug / mu))
        |    AS t_between
        |  FROM gstats CROSS JOIN tstats)
        |SELECT grp, n, round(mug_raw / 100.0, 4) AS mean_price,
        |  round(t_within, 4) AS theil
        |FROM within
        |UNION ALL
        |SELECT 'TOTAL', n, round(mu_raw / 100.0, 4), round(t_total, 4)
        |FROM total
        |UNION ALL
        |SELECT 'BETWEEN', n, CAST(NULL AS DOUBLE), round(t_between, 4)
        |FROM between_t CROSS JOIN total
        |ORDER BY grp""".stripMargin)
}
