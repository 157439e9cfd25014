package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.GlobalRowId

/** Round-10 surface batch 106: the Anderson–Darling uniformity audit
  * of the md5 sampling keys and Kendall's W rank concordance.
  *
  * Contrast with near-siblings: m151 (Cramér–von Mises) is the TWO-
  * SAMPLE drift test between eras; m180 is the ONE-SAMPLE calibration
  * audit of the engine's own sampling machinery — every deterministic
  * split/sample op (lp5/lp10/lp_hash_split) rests on "md5 keys are
  * uniform", and AD is the tail-weighted ECDF test that would catch a
  * biased key fold (its (F(1−F))⁻¹ weight makes it far more sensitive
  * at the extremes than KS/CvM, exactly where quota-boundary samplers
  * hurt). m184 fills the rank-agreement cell of the rater matrix:
  * m105 Kendall τ correlates TWO rankings, m112 Fleiss κ scores
  * CATEGORICAL raters, m150 ICC continuous scores; Kendall's W is the
  * m-rater RANK concordance — here, whether the five event streams
  * agree on how they order the most active users.
  *
  * Float discipline: AD draws u = (h+0.5)/65536 from exact 16-bit md5
  * folds (BIGINT-seeded), ranks via GlobalRowId (never a bare global
  * window), quantizes each (2i−1)lnu + (2(n−i)+1)ln(1−u) term to 1e6
  * BIGINT before the sum. W is exact end-to-end: unique tie-broken
  * ranks are a permutation, D₂ = Σ(2Rᵢ−m(n+1))² is an exact BIGINT,
  * and W = 3·D₂/(m²(n³−n)) is one division.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13; siblings m151 (SurfaceR10bm), m105/m112/
  * m150, lp5/lp10 (PipelineOps).
  */
object SurfaceR10db extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val PANEL = 100 // top-N users ranked by every stream

  /** 16-bit md5 fold (nibbles 1..4), BIGINT-seeded per the ANSI rule. */
  private def nib(e: String, p: Int): String =
    s"(instr('0123456789abcdef', substr(md5($e), $p, 1)) - 1)"
  private def fold16(e: String): String =
    s"(((CAST(${nib(e, 1)} AS BIGINT) * 16 + ${nib(e, 2)}) * 16 + " +
      s"${nib(e, 3)}) * 16 + ${nib(e, 4)})"

  /** Per-rank AD term, 1e6-quantized; i is the 1-based rank. */
  private val adTerm =
    "CAST(floor(((2 * i - 1) * ln((h + 0.5) / 65536) + " +
      "(2 * (n - i) + 1) * ln(1 - (h + 0.5) / 65536)) * 1e6 + 0.5) AS BIGINT)"

  /** M180: ANDERSON–DARLING — are the md5-fold sampling keys uniform?
    * u_i = (fold16(text)+0.5)/65536 over documents, A² = −n − (1/n)·
    * Σ[(2i−1)ln u_(i) + (2(n−i)+1)ln(1−u_(i))], reject at 5% if
    * A² > 2.492. One row.
    *
    * Scale shape: the global rank comes from GlobalRowId's range-
    * partition + offset scheme (the only single-task step is the
    * numPartitions-row offset cumsum); the statistic is then one hash
    * agg over quantized integer terms. Ties (equal h) are sum-
    * invariant: tied rows carry identical u, so any rank assignment
    * inside a tie block quantizes to the same terms.
    */
  val m180AndersonDarling: Q = (s, d) => {
    val keyed = documents(s, d)
      .select(col("doc_id"), expr(fold16("text")).as("h"))
    val ranked = GlobalRowId.withRowIdCols(keyed, Seq("h", "doc_id"),
        numPartitions = 32, outCol = "rid")
      .withColumn("i", col("rid") + 1)
    val n = ranked.groupBy().agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .select(col("n"), expr(adTerm).as("tq"))
      .groupBy("n").agg(sum("tq").as("sq"))
      .select(col("n"),
        r4(expr("-CAST(n AS DOUBLE) - CAST(sq AS DOUBLE) / 1e6 / n"))
          .as("a2"),
        expr("-CAST(n AS DOUBLE) - CAST(sq AS DOUBLE) / 1e6 / n < 2.492")
          .as("uniform_ok_5pct"))
  }

  /** M184: KENDALL'S W — do the five event streams rank the top-100
    * most active users the same way? Panel = top-PANEL users by total
    * event count (deterministic tie-break), score = exact cent-sum per
    * (stream, user) (0 where absent), unique tie-broken ranks, then
    * W = 3·Σ(2Rᵢ−m(n+1))² / (m²(n³−n)) and the χ² = m(n−1)·W readout.
    *
    * Scale shape: panel selection is a TakeOrdered (sort+limit) over a
    * per-user agg; everything after joins against the ≤PANEL-row
    * broadcast panel, so the ranking windows run over structurally
    * LIMIT-bounded input (the §16.10 boundedness proof), never the
    * full user population.
    */
  val m184KendallW: Q = (s, d) => {
    val e = events(s, d)
    val panel = e.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("user_id").asc)
      .limit(PANEL)
      .select(col("user_id"))
    val types = e.select(col("event_type")).distinct()
    // both sides bounded (LIMIT panel × distinct event types); the
    // broadcast hint makes the bounded build side explicit rather than
    // leaving it to AQE (r10 verdict consistency nit)
    val grid = panel.crossJoin(broadcast(types))
    val scores = e.groupBy("user_id", "event_type")
      .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("v"))
    val cells = grid.join(scores, Seq("user_id", "event_type"), "left")
      .select(col("user_id"), col("event_type"),
        coalesce(col("v"), lit(0L)).as("v"))
    val wRank = Window.partitionBy("event_type")
      .orderBy(col("v").desc, col("user_id").asc)
    val ranks = cells.withColumn("r", row_number().over(wRank))
    val sums = ranks.groupBy("user_id")
      .agg(sum("r").as("ri"), count(lit(1)).as("m"))
    val nRow = sums.agg(count(lit(1)).as("n"), max("m").as("m"))
    sums.crossJoin(broadcast(nRow.select(col("n"), col("m").as("mm"))))
      .select(expr("(2 * ri - mm * (n + 1)) * (2 * ri - mm * (n + 1))")
        .as("d2"), col("n"), col("mm"))
      .groupBy("n", "mm").agg(sum("d2").as("sd2"))
      .select(col("mm").as("m"), col("n"),
        r4(expr("3e0 * sd2 / (CAST(mm AS DOUBLE) * mm * " +
          "(CAST(n AS DOUBLE) * n * n - n))")).as("kendall_w"),
        r4(expr("mm * (n - 1) * (3e0 * sd2 / (CAST(mm AS DOUBLE) * mm * " +
          "(CAST(n AS DOUBLE) * n * n - n)))")).as("chi2"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m180_anderson_darling" -> m180AndersonDarling,
    "m184_kendall_w" -> m184KendallW)

  val oracleSql: Map[String, String] = Map(
    "m180_anderson_darling" ->
      s"""WITH keyed AS (
        |  SELECT doc_id, ${fold16("text")} AS h FROM documents),
        |ranked AS (
        |  SELECT h,
        |    CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS i
        |  FROM keyed),
        |terms AS (
        |  SELECT n, $adTerm AS tq
        |  FROM ranked CROSS JOIN
        |    (SELECT CAST(count(*) AS BIGINT) AS n FROM keyed)),
        |agg AS (
        |  SELECT n, CAST(sum(tq) AS BIGINT) AS sq FROM terms GROUP BY 1)
        |SELECT n,
        |  round(-CAST(n AS DOUBLE) - CAST(sq AS DOUBLE) / 1e6 / n, 4) AS a2,
        |  -CAST(n AS DOUBLE) - CAST(sq AS DOUBLE) / 1e6 / n < 2.492
        |    AS uniform_ok_5pct
        |FROM agg""".stripMargin,
    "m184_kendall_w" ->
      s"""WITH panel AS (
        |  SELECT user_id FROM events GROUP BY 1
        |  ORDER BY count(*) DESC, user_id LIMIT $PANEL),
        |types AS (SELECT DISTINCT event_type FROM events),
        |scores AS (
        |  SELECT user_id, event_type,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |cells AS (
        |  SELECT p.user_id, t.event_type, coalesce(s.v, 0) AS v
        |  FROM panel p CROSS JOIN types t
        |  LEFT JOIN scores s
        |    ON s.user_id = p.user_id AND s.event_type = t.event_type),
        |ranks AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY v DESC, user_id) AS BIGINT) AS r
        |  FROM cells),
        |sums AS (
        |  SELECT user_id, CAST(sum(r) AS BIGINT) AS ri,
        |    CAST(count(*) AS BIGINT) AS m
        |  FROM ranks GROUP BY 1),
        |nrow AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(max(m) AS BIGINT) AS mm
        |  FROM sums),
        |d AS (
        |  SELECT n, mm,
        |    CAST(sum((2 * ri - mm * (n + 1)) * (2 * ri - mm * (n + 1)))
        |      AS BIGINT) AS sd2
        |  FROM sums CROSS JOIN nrow GROUP BY 1, 2)
        |SELECT mm AS m, n,
        |  round(3e0 * sd2 / (CAST(mm AS DOUBLE) * mm *
        |    (CAST(n AS DOUBLE) * n * n - n)), 4) AS kendall_w,
        |  round(mm * (n - 1) * (3e0 * sd2 / (CAST(mm AS DOUBLE) * mm *
        |    (CAST(n AS DOUBLE) * n * n - n))), 4) AS chi2
        |FROM d""".stripMargin)
}
