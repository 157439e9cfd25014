package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 113: Krippendorff's alpha and the
  * wholetext / custom-lineSep reader path.
  *
  * Contrast with near-siblings: m76 (Cohen's κ) handles exactly TWO
  * raters on complete data, m112 (Fleiss κ) m raters but requires
  * every item fully rated; Krippendorff's α is the reliability
  * coefficient annotation pipelines actually need — it pools
  * PAIRABLE values per item, so raters may skip items (here: an
  * event stream "rates" only users it observed), and its expected
  * disagreement comes from the pooled coincidence marginals. For an
  * LLM labeling operation α is the label-quality gate; κ rows cannot
  * express missingness. s28 vs s17: s17 reads line-oriented text with
  * the default separator; s28 exercises the two reader options that
  * matter for DOCUMENT corpora — `wholetext` (one row per FILE, the
  * shape multi-line documents arrive in) and a custom `lineSep`
  * (records split on a delimiter other than newline) — on a file the
  * query itself lands deterministically.
  *
  * Float discipline: α reduces to ONE exact-integer closing division:
  * coincidence weights 1/(m−1) are scaled by 12 (divisible by every
  * m−1 ≤ 4), labels come from integer cross-multiplied banding
  * against the global mean (no float boundaries), and
  * α = 1 − 12·O·(N−1)/(144·N² − S₂) with O, N, S₂ exact (128-bit
  * products). The s28 fingerprint is an md5 over a deterministically
  * ordered single file.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 and §2.1 (sources); siblings m76/m112/m150,
  * s17 (SurfaceR6-family), s2b/s3b (Relational).
  */
object SurfaceR10di extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Label banding: per-(user, rater) average cents vs the global
    * per-event average, compared by integer cross-multiplication
    * (cents·TN vs band·ne·TC) — no float boundary. Bands at 0.8/1.0/
    * 1.2 of the global mean. */
  private val labelSql =
    """CASE WHEN 10 * cents * tn < 8 * ne * tc THEN 0
      |     WHEN 10 * cents * tn < 10 * ne * tc THEN 1
      |     WHEN 10 * cents * tn < 12 * ne * tc THEN 2
      |     ELSE 3 END""".stripMargin.replace('\n', ' ')

  /** Closing form from exact integers (see doc above). */
  private val alphaSql =
    "(1e0 - 12e0 * o12 * (nv - 1) / " +
      "(144e0 * CAST(nv AS DOUBLE) * nv - CAST(s2 AS DOUBLE)))"

  /** M191: KRIPPENDORFF'S ALPHA — items = users, raters = the five
    * event streams (a stream rates only users it observed → missing
    * ratings, α's home turf), nominal labels = mean-banded spend
    * levels. One row: pairable items/values, categories, Do, De, α.
    *
    * Scale shape: one (user, stream) hash agg, a broadcast scalar for
    * the banding, one per-item rater count, and the coincidence pairs
    * are ≤ m(m−1) ≤ 20 rows per item — linear in users end to end.
    */
  val m191Krippendorff: Q = (s, d) => {
    val cells = events(s, d).groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("ne"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("cents"))
    val tot = cells.agg(sum("ne").as("tn"), sum("cents").as("tc"))
    val labeled = cells.crossJoin(broadcast(tot))
      .select(col("user_id"), col("event_type"), expr(labelSql).as("lab"))
    val items = labeled.groupBy("user_id").agg(count(lit(1)).as("m"))
      .where(col("m") >= 2)
    val rated = labeled.join(items, "user_id")
    val pairs = rated.as("a").join(rated.as("b"), "user_id")
      .where(col("a.event_type") =!= col("b.event_type"))
      .select(col("a.lab").as("la"), col("b.lab").as("lb"),
        expr("12 DIV (a.m - 1)").as("w12"))
    val coin = pairs.groupBy("la", "lb").agg(sum("w12").as("o12"))
    val stats = coin.agg(
      sum(when(col("la") =!= col("lb"), col("o12")).otherwise(0L)).as("o12"),
      countDistinct("la").as("ncat"))
    val marg = coin.groupBy("la").agg(sum("o12").as("n12c"))
      .agg(sum(expr("CAST(n12c AS DECIMAL(38,0)) * n12c")).as("s2"))
    val nv = items.agg(sum("m").as("nv"), count(lit(1)).as("n_items"))
    stats.crossJoin(broadcast(marg)).crossJoin(broadcast(nv))
      .select(col("n_items"), col("nv").as("n_values"),
        col("ncat").as("n_categories"),
        r4(expr("CAST(o12 AS DOUBLE) / 12 / nv")).as("d_observed"),
        r4(expr("(144e0 * CAST(nv AS DOUBLE) * nv - CAST(s2 AS DOUBLE)) / " +
          "(144e0 * CAST(nv AS DOUBLE) * (nv - 1))")).as("d_expected"),
        r4(expr(alphaSql)).as("alpha"))
  }

  /** S28: WHOLETEXT + LINESEP — land the sorted nation names as ONE
    * text file with '|' as the record separator, then read it back
    * both ways: `wholetext` (one row per file) and `lineSep='|'`
    * (one row per record). One row: record count, file char count,
    * and the content md5 the oracle reconstructs from the table.
    *
    * Scale shape: a bounded dimension snapshot (25 rows) — the
    * single-file landing is the deliberate, documented shape for
    * dim exports; corpus-scale text uses the s17/lp6 sharded paths.
    */
  val s28Wholetext: Q = (s, d) => {
    val out = new java.io.File("target/tmp/s28_text").getAbsolutePath
    nation(s, d).select(col("n_name"))
      .repartition(1).sortWithinPartitions("n_name")
      .write.mode("overwrite").option("lineSep", "|").text(out)
    val whole = s.read.option("wholetext", "true").text(out)
      .agg(count(lit(1)).as("n_files"),
        sum(length(col("value"))).as("n_chars"),
        md5(concat_ws("", sort_array(collect_list(col("value"))))
          .cast("binary")).as("content_md5"))
    val recs = s.read.option("lineSep", "|").text(out)
      .where(length(col("value")) > 0)
      .agg(count(lit(1)).as("n_records"))
    whole.crossJoin(recs)
      .select(col("n_records"), col("n_files"), col("n_chars"),
        col("content_md5"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m191_krippendorff" -> m191Krippendorff,
    "s28_wholetext" -> s28Wholetext)

  val oracleSql: Map[String, String] = Map(
    "m191_krippendorff" ->
      s"""WITH cells AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS ne,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT CAST(sum(ne) AS BIGINT) AS tn,
        |    CAST(sum(cents) AS BIGINT) AS tc FROM cells),
        |labeled AS MATERIALIZED (
        |  SELECT user_id, event_type, $labelSql AS lab
        |  FROM cells CROSS JOIN tot),
        |items AS MATERIALIZED (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS m
        |  FROM labeled GROUP BY 1 HAVING count(*) >= 2),
        |pairs AS (
        |  SELECT a.lab AS la, b.lab AS lb, 12 // (i.m - 1) AS w12
        |  FROM labeled a
        |  JOIN labeled b ON b.user_id = a.user_id
        |    AND b.event_type <> a.event_type
        |  JOIN items i ON i.user_id = a.user_id),
        |coin AS MATERIALIZED (
        |  SELECT la, lb, CAST(sum(w12) AS BIGINT) AS o12
        |  FROM pairs GROUP BY 1, 2),
        |stats AS (
        |  SELECT CAST(sum(CASE WHEN la <> lb THEN o12 ELSE 0 END) AS BIGINT)
        |      AS o12,
        |    CAST(count(DISTINCT la) AS BIGINT) AS ncat
        |  FROM coin),
        |marg AS (
        |  SELECT CAST(sum(CAST(n12c AS HUGEINT) * n12c) AS HUGEINT) AS s2
        |  FROM (SELECT la, CAST(sum(o12) AS BIGINT) AS n12c
        |        FROM coin GROUP BY 1)),
        |nvt AS (
        |  SELECT CAST(sum(m) AS BIGINT) AS nv,
        |    CAST(count(*) AS BIGINT) AS n_items FROM items)
        |SELECT n_items, nv AS n_values, ncat AS n_categories,
        |  round(CAST(o12 AS DOUBLE) / 12 / nv, 4) AS d_observed,
        |  round((144e0 * CAST(nv AS DOUBLE) * nv - CAST(s2 AS DOUBLE)) /
        |    (144e0 * CAST(nv AS DOUBLE) * (nv - 1)), 4) AS d_expected,
        |  round($alphaSql, 4) AS alpha
        |FROM stats CROSS JOIN marg CROSS JOIN nvt""".stripMargin,
    "s28_wholetext" ->
      """WITH c AS (
        |  SELECT string_agg(n_name, '|' ORDER BY n_name) || '|' AS content,
        |    CAST(count(*) AS BIGINT) AS n_records
        |  FROM nation)
        |SELECT n_records, CAST(1 AS BIGINT) AS n_files,
        |  CAST(length(content) AS BIGINT) AS n_chars,
        |  md5(content) AS content_md5
        |FROM c""".stripMargin)
}
