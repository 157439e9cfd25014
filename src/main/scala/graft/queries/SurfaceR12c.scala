package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-12 surface batch 3: two curation/analytics operators with no
  * sibling in the registry —
  *
  *  - lt79 PERPLEXITY-FILTER scoring: lt76 TRAINS the Kneser–Ney bigram
  *    model and reports its probabilities; lt79 APPLIES that model back
  *    to every document (mean log-probability per bigram + a keep/drop
  *    gate), which is the standard perplexity-filter stage of an LLM
  *    data pipeline — lq scores surface heuristics (length/punct
  *    ratios), lt18 token entropy; only lt79 scores LIKELIHOOD UNDER A
  *    LANGUAGE MODEL.
  *  - lt80 SEQUENCE-PATTERN MATCHING (MATCH_RECOGNIZE-lite): q19's
  *    funnel checks milestone ORDER via min-timestamps (set
  *    semantics); lt80 matches a REGEX against each user's full
  *    time-ordered event string — adjacency, repetition, and exclusion
  *    classes ('view then purchase with nothing of either in between',
  *    longest error run), the SQL:2016 row-pattern class Spark has no
  *    native operator for.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.10 (curation), §2.13 (sequence analytics).
  */
object SurfaceR12c extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** The KN probability formula, shared TEXTUALLY with the oracle so
    * the closed form cannot drift (same discipline as lt76, which this
    * extends). All inputs are exact integers; the three divisions and
    * the final interpolation run in identical IEEE order. */
  private val pknExpr: String =
    """(CASE WHEN c12 - 0.75 > 0 THEN c12 - 0.75 ELSE 0 END) / c1
      |    + (0.75 * n1p_fwd / c1) * (CAST(n1p_bwd AS DOUBLE) / n_types)""".stripMargin

  /** Per-bigram-instance quantized log-probability and the doc readout,
    * shared textually. ln() may differ by 1–2 ulp across engines on the
    * SAME double, so each instance's log is floored onto the 1e-6 grid
    * BEFORE the per-doc sum (expected boundary flips ≈ rows × ulp/grid
    * ≪ 1 — the m204 exp/ln rule); the mean and the keep gate then run
    * on exact integers (keep ⇔ sum(ql) ≥ −8·1e6·n, an integer compare,
    * i.e. mean log-prob ≥ −8). */
  private val docReadout: String =
    """SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  round(CAST(sum(ql) AS DOUBLE) / (1000000.0 * count(*)), 4) AS avg_logprob,
      |  sum(ql) >= -8000000 * count(*) AS keep
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** LT79: KN DOC LOG-PROBABILITY (the perplexity filter). Model =
    * lt76's interpolated KN bigram table over the corpus itself; score
    * = mean ln P(w_i|w_{i−1}) over each document's bigram instances;
    * gate at mean ≥ −8 nats. Docs with fewer than two tokens carry no
    * bigram and drop out (both engines identically).
    *
    * Scale shape: two hash aggs build the model (bigram + fan-out
    * tables, vocabulary-sized); scoring is ONE equi-join of the
    * per-doc bigram stream against the model keyed by (w1,w2) — the
    * same join a KenLM-style scorer does against its ARPA table; no
    * per-doc recursion, no window over the corpus. */
  val lt79DocLogprob: Q = (s, d) => {
    documents(s, d).createOrReplaceTempView("graft_r12_documents")
    s.sql(
      s"""WITH toks AS (
        |  SELECT doc_id, tok,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY p) AS i
        |  FROM (SELECT doc_id, posexplode(split(text, ' ')) AS (p, tok)
        |        FROM graft_r12_documents)
        |  WHERE length(tok) > 0),
        |inst AS (
        |  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
        |  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
        |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |       FROM inst GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
        |               CAST(count(*) AS BIGINT) AS n1p_fwd FROM bg GROUP BY 1),
        |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_bwd FROM bg GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM bg),
        |pkn AS (
        |  SELECT bg.w1, bg.w2, $pknExpr AS p
        |  FROM bg JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tot),
        |scored AS (
        |  SELECT inst.doc_id,
        |    CAST(floor(ln(p) * 1000000 + 0.5) AS BIGINT) AS ql
        |  FROM inst JOIN pkn USING (w1, w2))
        |$docReadout""".stripMargin)
  }

  /** LT80: EVENT-SEQUENCE REGEX (MATCH_RECOGNIZE-lite). Each user's
    * events, ordered by (ts, event_id), become one character string
    * (click→c, error→e, purchase→p, signup→s, view→v — first letters,
    * distinct on this taxonomy); then
    *   n_direct_funnels = non-overlapping matches of `v[^vp]*p`
    *     (a view converting to a purchase with no intervening view or
    *      purchase — adjacency semantics q19's min-ts funnel cannot
    *      express), and
    *   max_error_run = longest `e+` run (burst detection).
    * Regex stays in the Java∩RE2 common subset (literals + negated
    * class + `+`), and both engines count leftmost non-overlapping
    * matches.
    *
    * Scale shape: one partitioned sort-agg per user (sequence length =
    * per-user activity, not corpus size) and per-row regexes on the
    * bounded strings; the shuffle is keyed by user — the q26
    * sessionization shape with a regex readout. */
  val lt80EventRegex: Q = (s, d) => {
    val seqs = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ch"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        concat_ws("", transform(
          sort_array(collect_list(struct(col("ts"), col("event_id"), col("ch")))),
          x => x.getField("ch"))).as("seq"))
    seqs.select(col("user_id"), col("n_events"),
        size(expr("regexp_extract_all(seq, 'v[^vp]*p', 0)")).cast("long")
          .as("n_direct_funnels"),
        coalesce(
          array_max(transform(expr("regexp_extract_all(seq, 'e+', 0)"),
            x => length(x))), lit(0)).cast("long").as("max_error_run"))
      .orderBy("user_id")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lt79_doc_logprob" -> lt79DocLogprob,
    "lt80_event_regex" -> lt80EventRegex)

  val oracleSql: Map[String, String] = Map(
    "lt79_doc_logprob" ->
      s"""WITH toks AS (
        |  SELECT doc_id, tok,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY p) AS i
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |               generate_subscripts(string_split(text, ' '), 1) AS p
        |        FROM documents)
        |  WHERE length(tok) > 0),
        |inst AS (
        |  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
        |  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1),
        |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        |       FROM inst GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
        |               CAST(count(*) AS BIGINT) AS n1p_fwd FROM bg GROUP BY 1),
        |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_bwd FROM bg GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM bg),
        |pkn AS (
        |  SELECT bg.w1, bg.w2, $pknExpr AS p
        |  FROM bg JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tot),
        |scored AS (
        |  SELECT inst.doc_id,
        |    CAST(floor(ln(p) * 1000000 + 0.5) AS BIGINT) AS ql
        |  FROM inst JOIN pkn USING (w1, w2))
        |$docReadout""".stripMargin,
    "lt80_event_regex" ->
      """WITH seqs AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_events,
        |  CAST(len(regexp_extract_all(seq, 'v[^vp]*p')) AS BIGINT)
        |    AS n_direct_funnels,
        |  CAST(coalesce(list_max(list_transform(
        |    regexp_extract_all(seq, 'e+'), x -> len(x))), 0) AS BIGINT)
        |    AS max_error_run
        |FROM seqs ORDER BY user_id""".stripMargin)
}
