package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 103: the fill-in-the-middle training
  * transform and sample entropy of the hourly activity series.
  *
  * Contrast with near-siblings: lp8 chunks documents at FIXED
  * boundaries and lp58 at overlapping strides — both preserve reading
  * order; lp72 is the FIM/infilling transform (Bavarian et al.'s data
  * recipe): per selected document, two hash-chosen cut points split it
  * into (prefix, middle, suffix) and the emitted training text moves
  * the middle to the END (PSM or SPM layout, hash-chosen 50/50) so a
  * causal LM learns to infill. No existing op reorders content. lt63
  * vs the entropy family: lt18/lt31 measure DISTRIBUTION entropy of
  * tokens/chars, lt25 conditional entropy of bigrams — all orderless
  * histograms; sample entropy measures SERIES regularity (the chance
  * that runs matching for m=2 steps still match at m+1), catching
  * nonlinear regularity that lt11's linear ACF and lt51's KPSS cannot
  * see. Exact-integer template counts, not kernel estimates.
  *
  * Float discipline: FIM is string-only (md5-nibble folds seeded
  * BIGINT per the ANSI-overflow rule; cut arithmetic in BIGINT; the
  * layout fingerprinted by md5 so the oracle compares one cell, not
  * kilobytes). SampEn counts template matches with an INTEGER
  * tolerance r = floor(0.2·sd) on integer daily counts — A, B are
  * exact BIGINTs and −ln(A/B) is the single closing double.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.8 (curation) and §2.13 (series diagnostics);
  * siblings lp8/lp58 (chunking), lt11/lt18/lt25/lt31 (entropy/ACF).
  */
object SurfaceR10cy extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val MIN_CHARS = 20 // docs shorter than this skip the transform

  /** md5-nibble fold (positions p..p+3 → 0..65535), BIGINT-seeded. */
  private def nib(expr: String, p: Int): String =
    s"(instr('0123456789abcdef', substr(md5($expr), $p, 1)) - 1)"
  private def fold4(expr: String, p: Int): String =
    s"(((CAST(${nib(expr, p)} AS BIGINT) * 16 + ${nib(expr, p + 1)}) * 16 + " +
      s"${nib(expr, p + 2)}) * 16 + ${nib(expr, p + 3)})"

  /** Shared FIM construction — one SQL text both engines evaluate.
    * Cut points from two independent 16-bit folds of md5(text); mode
    * from nibble 9. */
  private val fimLo =
    s"least(1 + ${fold4("text", 1)} % CAST(length(text) AS BIGINT), " +
      s"1 + ${fold4("text", 5)} % CAST(length(text) AS BIGINT))"
  private val fimHi =
    s"greatest(1 + ${fold4("text", 1)} % CAST(length(text) AS BIGINT), " +
      s"1 + ${fold4("text", 5)} % CAST(length(text) AS BIGINT))"
  private val fimMode =
    s"CASE WHEN ${nib("text", 9)} < 8 THEN 'psm' ELSE 'spm' END"
  private val fimText =
    """CASE WHEN mode = 'psm'
      |  THEN '<PRE>' || substr(text, 1, CAST(lo - 1 AS INT)) ||
      |       '<SUF>' || substr(text, CAST(hi AS INT)) ||
      |       '<MID>' || substr(text, CAST(lo AS INT), CAST(hi - lo AS INT))
      |  ELSE '<SUF>' || substr(text, CAST(hi AS INT)) ||
      |       '<PRE>' || substr(text, 1, CAST(lo - 1 AS INT)) ||
      |       '<MID>' || substr(text, CAST(lo AS INT), CAST(hi - lo AS INT))
      |END""".stripMargin.replace('\n', ' ')

  /** LP72: FIM TRANSFORM — per document ≥ MIN_CHARS, split at two
    * md5-derived cut points and emit the infilling layout (PSM or SPM,
    * hash-chosen), fingerprinted by md5. Columns: cut points, the
    * three segment lengths (they always sum to length(text)), mode,
    * and the layout fingerprint.
    *
    * Scale shape: a pure narrow map over the corpus — no shuffle at
    * all beyond the final presentation sort; cut choice rides on
    * md5(text) so it is stable under repartition/retry (the lp10
    * membership idiom applied to augmentation).
    */
  val lp72FimTransform: Q = (s, d) => {
    documents(s, d)
      .where(length(col("text")) >= MIN_CHARS)
      .select(col("doc_id"), col("text"),
        expr(fimLo).as("lo"), expr(fimHi).as("hi"),
        expr(fimMode).as("mode"))
      .select(col("doc_id"), col("mode"), col("lo"), col("hi"),
        expr("lo - 1").as("prefix_len"),
        expr("hi - lo").as("middle_len"),
        expr("CAST(length(text) AS BIGINT) - hi + 1").as("suffix_len"),
        expr(s"md5($fimText)").as("fim_md5"))
      .orderBy("doc_id")
  }

  /** LT63: SAMPLE ENTROPY — SampEn(m=2, r=⌊0.2·sd⌋) per event_type
    * over the HOURLY count series (daily is too short/coarse on the
    * 30-day fixture span to populate templates): B counts hour-pairs whose
    * length-2 templates stay within r componentwise, A the same at
    * length 3; SampEn = −ln(A/B). Exact integer tolerance on integer
    * counts → A and B are exact; one closing ln.
    *
    * Scale shape: the template table is calendar-bounded (≤ #hours rows
    * per type regardless of corpus size), so the per-type equi-join is
    * a bounded O(days²) comparison — the corpus-size-dependent work is
    * only the first per-(type,day) hash agg.
    */
  val lt63SampleEntropy: Q = (s, d) => {
    val daily = events(s, d)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 3600000000) AS BIGINT)").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("x"))
    val rq = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("x").as("s1"),
        sum(expr("x * x")).as("s2"))
      .select(col("event_type"), col("n"),
        expr("CAST(floor(0.2 * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / " +
          "(CAST(n AS DOUBLE) * (n - 1)))) AS BIGINT)").as("r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    val tpl = daily
      .withColumn("x1", lead(col("x"), 1).over(w))
      .withColumn("x2", lead(col("x"), 2).over(w))
      .where(col("x2").isNotNull)
      .withColumn("i", row_number().over(w))
    val pairs = tpl.as("a").join(tpl.as("b"), "event_type")
      .where(col("a.i") < col("b.i"))
      .join(broadcast(rq), "event_type")
      .select(col("event_type"),
        (abs(col("a.x") - col("b.x")) <= col("r") &&
          abs(col("a.x1") - col("b.x1")) <= col("r")).as("m2"),
        (abs(col("a.x") - col("b.x")) <= col("r") &&
          abs(col("a.x1") - col("b.x1")) <= col("r") &&
          abs(col("a.x2") - col("b.x2")) <= col("r")).as("m3"))
    pairs.groupBy("event_type")
      .agg(sum(when(col("m2"), 1L).otherwise(0L)).as("b_count"),
        sum(when(col("m3"), 1L).otherwise(0L)).as("a_count"))
      .select(col("event_type"), col("b_count"), col("a_count"),
        r4(expr("CASE WHEN a_count > 0 AND b_count > 0 THEN " +
          "-ln(CAST(a_count AS DOUBLE) / b_count) END")).as("sampen"))
      .orderBy("event_type")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp72_fim_transform" -> lp72FimTransform,
    "lt63_sample_entropy" -> lt63SampleEntropy)

  val oracleSql: Map[String, String] = Map(
    "lp72_fim_transform" ->
      s"""WITH cut AS (
        |  SELECT doc_id, text,
        |    $fimLo AS lo, $fimHi AS hi, $fimMode AS mode
        |  FROM documents WHERE length(text) >= $MIN_CHARS)
        |SELECT doc_id, mode, lo, hi,
        |  lo - 1 AS prefix_len,
        |  hi - lo AS middle_len,
        |  CAST(length(text) AS BIGINT) - hi + 1 AS suffix_len,
        |  md5($fimText) AS fim_md5
        |FROM cut ORDER BY doc_id""".stripMargin,
    "lt63_sample_entropy" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |rq AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(floor(0.2 * sqrt(CAST(count(*) * sum(x * x) -
        |      sum(x) * sum(x) AS DOUBLE) /
        |      (CAST(count(*) AS DOUBLE) * (count(*) - 1)))) AS BIGINT) AS r
        |  FROM daily GROUP BY 1),
        |tpl AS (
        |  SELECT event_type, x, x1, x2,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
        |  FROM (
        |    SELECT event_type, day, x,
        |      lead(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS x1,
        |      lead(x, 2) OVER (PARTITION BY event_type ORDER BY day) AS x2
        |    FROM daily)
        |  WHERE x2 IS NOT NULL),
        |pairs AS (
        |  SELECT a.event_type,
        |    (abs(a.x - b.x) <= r.r AND abs(a.x1 - b.x1) <= r.r) AS m2,
        |    (abs(a.x - b.x) <= r.r AND abs(a.x1 - b.x1) <= r.r
        |      AND abs(a.x2 - b.x2) <= r.r) AS m3
        |  FROM tpl a JOIN tpl b ON a.event_type = b.event_type AND a.i < b.i
        |  JOIN rq r ON r.event_type = a.event_type)
        |SELECT event_type,
        |  CAST(sum(CASE WHEN m2 THEN 1 ELSE 0 END) AS BIGINT) AS b_count,
        |  CAST(sum(CASE WHEN m3 THEN 1 ELSE 0 END) AS BIGINT) AS a_count,
        |  round(CASE WHEN sum(CASE WHEN m3 THEN 1 ELSE 0 END) > 0
        |      AND sum(CASE WHEN m2 THEN 1 ELSE 0 END) > 0 THEN
        |    -ln(CAST(sum(CASE WHEN m3 THEN 1 ELSE 0 END) AS DOUBLE) /
        |        sum(CASE WHEN m2 THEN 1 ELSE 0 END)) END, 4) AS sampen
        |FROM pairs GROUP BY 1 ORDER BY event_type""".stripMargin)
}
