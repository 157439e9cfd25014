package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 108: soundex phonetic blocking and distance
  * correlation.
  *
  * Contrast with near-siblings: the fuzzy-match family measures edit
  * DISTANCE between candidate pairs (f13 Levenshtein, f18 edit-
  * distance join, lf3 Jaro, lf fingerprint canonicalizes by sorted
  * chars); f30 covers Spark's `soundex` builtin — a phonetic CODE that
  * blocks words by how they SOUND (red/rod share R300 despite edit
  * distance 2), the classic pre-join blocking key record linkage runs
  * before any pairwise distance. m186 vs the dependence family: m18/
  * a7 Pearson reads LINEAR association, m67 Spearman monotone, m141
  * Chatterjee ξ functional y=f(x) (asymmetric); distance correlation
  * is zero IFF the series are independent — it detects arbitrary
  * (e.g. V-shaped) dependence symmetrically, and the Pearson column
  * sits alongside so the readout shows what the linear lens misses.
  *
  * Float discipline: soundex is string-only (the DuckDB side
  * implements the classic code table with RE2-safe regexes — no
  * backreferences). dCor double-centers WITHOUT divisions by scaling
  * through n²: Ã = n²a − nR_i − nR_j + G is an exact BIGINT, the
  * three ΣÃB̃ accumulate in DECIMAL(38,0)/HUGEINT, and
  * dCor = ΣÃB̃/√(ΣÃ²·ΣB̃²) is one shared closing text (the n⁶ scale
  * cancels). Limitation stated: the oracle's soundex omits the
  * H/W-adjacency merge rule; the fixture vocabulary (15 words,
  * spec-asserted) contains no such case, and the ScalaTest law
  * compares Spark's builtin against this data directly.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.6 (functions) and §2.13; siblings f13/f18/lf3
  * (fuzzy), m18/m67/m141 (dependence).
  */
object SurfaceR10dd extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** F30: SOUNDEX BLOCKING — code every part-name word with the
    * builtin, then report each phonetic bucket: distinct words, their
    * sorted list, and total occurrences. Buckets with n_words > 1 are
    * the phonetic collisions a record-linkage blocker would join.
    *
    * Scale shape: narrow split/explode → hash agg on the 4-char code;
    * the word domain is vocabulary-bounded, so the agg output is tiny
    * regardless of corpus size.
    */
  val f30Soundex: Q = (s, d) => {
    val words = part(s, d)
      .select(explode(split(col("p_name"), " ")).as("w"))
      .where(length(col("w")) > 0)
    words.select(soundex(col("w")).as("sx"), col("w"))
      .groupBy("sx", "w").agg(count(lit(1)).as("occ"))
      .groupBy("sx")
      .agg(countDistinct("w").as("n_words"),
        sort_array(collect_set(col("w"))).as("ws"),
        sum("occ").as("n_occurrences"))
      .select(col("sx"), col("n_words"),
        concat_ws(",", col("ws")).as("words"), col("n_occurrences"))
      .orderBy("sx")
  }

  /** Closing formula: the n⁶ scale cancels in the ratio. */
  private val dcorSql =
    "(CAST(sab AS DOUBLE) / sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE)))"
  /** Pearson r from exact sums (m155 shape). */
  private val pearsonSql =
    "((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy) / " +
      "(sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) * " +
      "sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)))"

  /** M186: DISTANCE CORRELATION — per event_type, between the daily
    * event count and the daily cent volume: double-centered distance
    * matrices via the n²-scaled exact form, dCor = ΣÃB̃/√(ΣÃ²ΣB̃²),
    * with Pearson r alongside.
    *
    * Scale shape: the day-pair table is calendar-bounded (days² per
    * type, independent of corpus size); two bounded aggs (row sums,
    * then the product sums). The corpus-scaled work is one daily hash
    * agg.
    */
  val m186DistanceCorrelation: Q = (s, d) => {
    val daily = events(s, d)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("x"), sum("c").as("y"))
    val n1 = daily.groupBy("event_type").agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(expr("x * x")).as("sxx"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
      sum(expr("x * y")).as("sxy"))
    val pairs = daily.as("a").join(daily.as("b"), "event_type")
      .select(col("event_type"), col("a.day").as("di"), col("b.day").as("dj"),
        abs(col("a.x") - col("b.x")).as("ax"),
        abs(col("a.y") - col("b.y")).as("ay"))
    val rows = pairs.groupBy(col("event_type"), col("di"))
      .agg(sum("ax").as("rx"), sum("ay").as("ry"))
    val tots = rows.groupBy("event_type")
      .agg(sum("rx").as("gx"), sum("ry").as("gy"))
    val centered = pairs
      .join(rows.select(col("event_type"), col("di"),
        col("rx").as("rxi"), col("ry").as("ryi")), Seq("event_type", "di"))
      .join(rows.select(col("event_type"), col("di").as("dj"),
        col("rx").as("rxj"), col("ry").as("ryj")), Seq("event_type", "dj"))
      .join(broadcast(tots), "event_type")
      .join(broadcast(n1.select(col("event_type"), col("n"))), "event_type")
      .select(col("event_type"),
        expr("n * n * ax - n * rxi - n * rxj + gx").as("ta"),
        expr("n * n * ay - n * ryi - n * ryj + gy").as("tb"))
    centered.groupBy("event_type")
      .agg(sum(expr("CAST(ta AS DECIMAL(38,0)) * tb")).as("sab"),
        sum(expr("CAST(ta AS DECIMAL(38,0)) * ta")).as("saa"),
        sum(expr("CAST(tb AS DECIMAL(38,0)) * tb")).as("sbb"))
      .join(broadcast(n1), "event_type")
      .select(col("event_type"), col("n"),
        r4(expr(dcorSql)).as("dcor"),
        r4(expr(pearsonSql)).as("pearson_r"))
      .orderBy("event_type")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "f30_soundex" -> f30Soundex,
    "m186_distance_correlation" -> m186DistanceCorrelation)

  /** Classic soundex in RE2-safe SQL: 7 class→digit replaces, 7 run
    * collapses (no backreferences), drop the first letter's digit,
    * strip zeros, pad. Omits the H/W-adjacency merge (stated above). */
  private val sxDigits = Seq(
    "[BFPV]" -> "1", "[CGJKQSXZ]" -> "2", "[DT]" -> "3",
    "L" -> "4", "[MN]" -> "5", "R" -> "6", "[AEIOUYHW]" -> "0")
  private def sxExpr(col: String): String = {
    val mapped = sxDigits.foldLeft(s"upper($col)") { case (e, (cls, dig)) =>
      s"regexp_replace($e, '$cls', '$dig', 'g')"
    }
    val collapsed = (0 to 6).foldLeft(mapped) { (e, dg) =>
      s"regexp_replace($e, '$dg{2,}', '$dg', 'g')"
    }
    s"substr(upper($col), 1, 1) || " +
      s"substr(replace(substr($collapsed, 2), '0', '') || '000', 1, 3)"
  }

  val oracleSql: Map[String, String] = Map(
    "f30_soundex" ->
      s"""WITH words AS (
        |  SELECT unnest(string_split(p_name, ' ')) AS w FROM part),
        |coded AS (
        |  SELECT ${sxExpr("w")} AS sx, w FROM words WHERE length(w) > 0),
        |occ AS (
        |  SELECT sx, w, CAST(count(*) AS BIGINT) AS occ
        |  FROM coded GROUP BY 1, 2)
        |SELECT sx, CAST(count(*) AS BIGINT) AS n_words,
        |  string_agg(w, ',' ORDER BY w) AS words,
        |  CAST(sum(occ) AS BIGINT) AS n_occurrences
        |FROM occ GROUP BY sx ORDER BY sx""".stripMargin,
    "m186_distance_correlation" ->
      s"""WITH daily AS MATERIALIZED (
        |  SELECT event_type,
        |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |n1 AS MATERIALIZED (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM daily GROUP BY 1),
        |pairs AS MATERIALIZED (
        |  SELECT a.event_type, a.day AS di, b.day AS dj,
        |    abs(a.x - b.x) AS ax, abs(a.y - b.y) AS ay
        |  FROM daily a JOIN daily b USING (event_type)),
        |rows_ AS MATERIALIZED (
        |  SELECT event_type, di, CAST(sum(ax) AS BIGINT) AS rx,
        |    CAST(sum(ay) AS BIGINT) AS ry
        |  FROM pairs GROUP BY 1, 2),
        |tots AS (
        |  SELECT event_type, CAST(sum(rx) AS BIGINT) AS gx,
        |    CAST(sum(ry) AS BIGINT) AS gy
        |  FROM rows_ GROUP BY 1),
        |centered AS (
        |  SELECT p.event_type,
        |    n.n * n.n * p.ax - n.n * ri.rx - n.n * rj.rx + t.gx AS ta,
        |    n.n * n.n * p.ay - n.n * ri.ry - n.n * rj.ry + t.gy AS tb
        |  FROM pairs p
        |  JOIN rows_ ri ON ri.event_type = p.event_type AND ri.di = p.di
        |  JOIN rows_ rj ON rj.event_type = p.event_type AND rj.di = p.dj
        |  JOIN tots t ON t.event_type = p.event_type
        |  JOIN n1 n ON n.event_type = p.event_type),
        |sums AS (
        |  SELECT event_type,
        |    CAST(sum(CAST(ta AS HUGEINT) * tb) AS HUGEINT) AS sab,
        |    CAST(sum(CAST(ta AS HUGEINT) * ta) AS HUGEINT) AS saa,
        |    CAST(sum(CAST(tb AS HUGEINT) * tb) AS HUGEINT) AS sbb
        |  FROM centered GROUP BY 1)
        |SELECT s.event_type, n.n,
        |  round($dcorSql, 4) AS dcor,
        |  round($pearsonSql, 4) AS pearson_r
        |FROM sums s JOIN n1 n ON n.event_type = s.event_type
        |ORDER BY s.event_type""".stripMargin)
}
