package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 102: two training-data curation primitives —
  * survey raking (iterative proportional fitting) for joint marginal
  * rebalancing, and preference-pair construction for DPO/RLHF data.
  *
  * Contrast with near-siblings: the existing mixture ops each take ONE
  * constraint set — lp63 (Neyman) sizes strata for minimum variance,
  * lp67 (temperature) power-scales source shares, lp29 (waterfill) caps
  * per-source draws, lp37 allocates a fixed quota. lp70 solves the
  * problem none of them can: TWO simultaneous marginal targets (per-
  * language AND per-source document shares) with no target for the
  * joint cell — the classic IPF/raking estimator, which finds the
  * unique minimum-KL reweighting matching both margins. lp71 vs lp34:
  * negative sampling draws hash-RANDOM non-matches for retrieval
  * training; lp71 builds SCORE-DRIVEN (chosen, rejected) pairs — per
  * prompt group the argmax candidate against its hardest sufficiently-
  * worse alternatives (margin ≥ δ, best-scored first) — the dataset
  * shape preference-optimization trainers consume. w7/q3 rank rows but
  * emit no pairs.
  *
  * Float discipline: raking runs ENTIRELY in scaled integers — weights
  * are 1e6-scaled BIGINTs, each IPF step is w' = (w·N·1e6) DIV (k·S)
  * with S an exact integer marginal sum, so both engines walk the
  * identical integer sequence and the only doubles are the final
  * single-division readouts. Preference margins are single double
  * subtractions of parquet-identical cells.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.8 (curation/mixing); siblings lp63/lp67 (SurfaceR10),
  * lp29 (SurfaceR8), lp34 (SurfaceR6), lp37.
  */
object SurfaceR10cx extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val ROUNDS = 3    // IPF row+col passes (integer-exact)
  private val MARGIN = 50.0 // preference-pair score gap δ
  private val PAIRS_PER_PROMPT = 2

  /** LP70: RAKING — reweight the lang×source contingency table so that
    * language marginals AND source marginals both hit uniform targets
    * (N/k_lang, N/k_src), via 3 integer-exact IPF rounds. Emits one row
    * per observed cell: count, raked weight, raked document mass.
    *
    * Scale shape: one hash agg collapses the corpus to ≤ k_l·k_s cells;
    * every IPF step is a group-agg + broadcast join over that bounded
    * cell table — iteration cost is independent of corpus size, and
    * the weights apply back to documents as a broadcast map-side join.
    */
  val lp70Raking: Q = (s, d) => {
    val cells0 = documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .withColumn("w", lit(1000000L))
    val tot = cells0.agg(sum("n").as("nn"),
      countDistinct("lang").as("kl"), countDistinct("source").as("ks"))

    var cells = cells0.crossJoin(broadcast(tot)).localCheckpoint(true)
    for (_ <- 1 to ROUNDS) {
      val rowS = cells.groupBy(col("lang").as("l2"))
        .agg(sum(expr("n * w")).as("sr"))
      cells = cells.join(broadcast(rowS), col("lang") === col("l2"))
        .select(col("lang"), col("source"), col("n"),
          expr("(w * nn * 1000000) DIV (kl * sr)").as("w"),
          col("nn"), col("kl"), col("ks"))
        .localCheckpoint(true)
      val colS = cells.groupBy(col("source").as("s2"))
        .agg(sum(expr("n * w")).as("sc"))
      cells = cells.join(broadcast(colS), col("source") === col("s2"))
        .select(col("lang"), col("source"), col("n"),
          expr("(w * nn * 1000000) DIV (ks * sc)").as("w"),
          col("nn"), col("kl"), col("ks"))
        .localCheckpoint(true)
    }
    cells.select(col("lang"), col("source"), col("n"),
        r4(expr("CAST(w AS DOUBLE) / 1e6")).as("raked_weight"),
        r4(expr("CAST(n AS DOUBLE) * w / 1e6")).as("raked_docs"))
      .orderBy("lang", "source")
  }

  /** LP71: PREFERENCE PAIRS — per prompt group (user_id stands in for
    * the prompt; events are scored candidate responses), pair the
    * argmax-scored candidate (ties → lowest event_id) with its up-to-2
    * hardest sufficiently-worse alternatives: score ≤ chosen − δ,
    * highest-scored first. Emits (prompt, chosen, rejected, margin,
    * pair_rank).
    *
    * Scale shape: two windows partitioned by the prompt key (per-group
    * cardinality is session-bounded, never corpus-scaled) and one
    * broadcast-size self-join per group — no all-pairs: each group
    * emits at most PAIRS_PER_PROMPT rows.
    */
  val lp71PreferencePairs: Q = (s, d) => {
    val e = events(s, d).select(col("user_id"), col("event_id"), col("value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id").asc)
    val ranked = e.withColumn("rn", row_number().over(w))
    val chosen = ranked.where(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("chosen_id"),
        col("value").as("chosen_v"))
    val rej = e.join(chosen, "user_id")
      .where(col("event_id") =!= col("chosen_id") &&
        col("value") <= col("chosen_v") - MARGIN)
    val wr = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id").asc)
    rej.withColumn("pair_rank", row_number().over(wr))
      .where(col("pair_rank") <= PAIRS_PER_PROMPT)
      .select(col("user_id"), col("chosen_id"),
        col("event_id").as("rejected_id"),
        r4(col("chosen_v") - col("value")).as("margin"),
        col("pair_rank"))
      .orderBy("user_id", "pair_rank")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp70_raking" -> lp70Raking,
    "lp71_preference_pairs" -> lp71PreferencePairs)

  /** Unrolled IPF chain; every w CTE is referenced twice (next step's
    * marginal sum + update join), so each is MATERIALIZED — DuckDB
    * inlines plain CTEs and would re-expand the chain exponentially
    * (the lg8 lesson). */
  private def rakingSql: String = {
    val steps = new StringBuilder
    var cur = "w0"
    for (i <- 1 to ROUNDS) {
      steps.append(
        s"""r$i AS (SELECT lang, sum(n * w) AS sr FROM $cur GROUP BY 1),
           |wr$i AS MATERIALIZED (
           |  SELECT c.lang, c.source, c.n,
           |    (c.w * t.nn * 1000000) // (t.kl * r.sr) AS w
           |  FROM $cur c, r$i r, tot t WHERE c.lang = r.lang),
           |c$i AS (SELECT source, sum(n * w) AS sc FROM wr$i GROUP BY 1),
           |wc$i AS MATERIALIZED (
           |  SELECT c.lang, c.source, c.n,
           |    (c.w * t.nn * 1000000) // (t.ks * s.sc) AS w
           |  FROM wr$i c, c$i s, tot t WHERE c.source = s.source),
           |""".stripMargin)
      cur = s"wc$i"
    }
    s"""WITH cells AS MATERIALIZED (
       |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
       |  FROM documents GROUP BY 1, 2),
       |tot AS MATERIALIZED (
       |  SELECT CAST(sum(n) AS BIGINT) AS nn,
       |    CAST(count(DISTINCT lang) AS BIGINT) AS kl,
       |    CAST(count(DISTINCT source) AS BIGINT) AS ks
       |  FROM cells),
       |w0 AS MATERIALIZED (
       |  SELECT lang, source, n, CAST(1000000 AS BIGINT) AS w FROM cells),
       |${steps.toString}
       |fin AS (SELECT * FROM $cur)
       |SELECT lang, source, n,
       |  round(CAST(w AS DOUBLE) / 1e6, 4) AS raked_weight,
       |  round(CAST(n AS DOUBLE) * w / 1e6, 4) AS raked_docs
       |FROM fin ORDER BY lang, source""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "lp70_raking" -> rakingSql,
    "lp71_preference_pairs" ->
      s"""WITH e AS (
        |  SELECT user_id, event_id, value FROM events),
        |chosen AS (
        |  SELECT user_id, event_id AS chosen_id, value AS chosen_v FROM (
        |    SELECT user_id, event_id, value,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY value DESC, event_id) AS rn
        |    FROM e)
        |  WHERE rn = 1),
        |rej AS (
        |  SELECT e.user_id, c.chosen_id, e.event_id AS rejected_id,
        |    c.chosen_v - e.value AS marg,
        |    CAST(row_number() OVER (PARTITION BY e.user_id
        |      ORDER BY e.value DESC, e.event_id) AS INT) AS pair_rank
        |  FROM e JOIN chosen c USING (user_id)
        |  WHERE e.event_id <> c.chosen_id
        |    AND e.value <= c.chosen_v - $MARGIN)
        |SELECT user_id, chosen_id, rejected_id,
        |  round(marg, 4) AS margin, pair_rank
        |FROM rej WHERE pair_rank <= $PAIRS_PER_PROMPT
        |ORDER BY user_id, pair_rank""".stripMargin)
}
