package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 107: the embargo-gapped chronological split
  * and the two-sample energy distance.
  *
  * Contrast with near-siblings: every existing split is EXCHANGEABLE —
  * lp_hash_split/lp10 draw by md5 membership, lp24 keeps clusters
  * together, lp46 AUDITS leakage after the fact. lp73 is the split a
  * time-ordered corpus needs: train = history up to the 70th-
  * percentile active day, then an EMBARGO window is dropped entirely
  * so autocorrelated rows cannot leak label information across the
  * boundary, test = strictly after the embargo — look-ahead bias is
  * excluded BY CONSTRUCTION, not detected afterwards. m185 vs m151/
  * m46: KS reads the max ECDF gap and CvM integrates the squared gap
  * AGAINST THE POOLED ECDF — both reweight by where data happen to
  * sit; the energy statistic E = 2E|X−Y| − E|X−X'| − E|Y−Y'|
  * integrates against Lebesgue measure (in 1-D it is twice the Cramér
  * L² distance), so it stays sensitive to shape differences out in
  * sparse tails, and on integer daily counts every pairwise term is
  * an exact BIGINT.
  *
  * Float discipline: lp73 is integer-only until the share readout
  * (days and row counts). m185's three pairwise sums are exact
  * BIGINTs; E and T are a shared closing text of single divisions.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.8 (splits) and §2.13 (drift); siblings
  * lp_hash_split/lp10/lp24/lp46, m46/m151 (SurfaceR10bm).
  */
object SurfaceR10dc extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val TRAIN_FRAC = 0.7
  private val EMBARGO_DAYS = 2

  /** LP73: TEMPORAL SPLIT — boundary day = the 70th-percentile rank of
    * the DISTINCT active days (deterministic, no interpolation), then
    * train ≤ B, drop (B, B+2], test > B+2. One row per split with row/
    * day extents and the achieved row share.
    *
    * Scale shape: the day list is calendar-bounded, so its ordering
    * window is over ≤ #days rows; rows then route via a broadcast
    * range test — one scan, no row-level window over facts.
    */
  val lp73TemporalSplit: Q = (s, d) => {
    val e = events(s, d)
      .select(col("event_id"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"))
    val days = e.select(col("day")).distinct()
    val nd = days.agg(count(lit(1)).as("nd"))
    val boundary = days
      .crossJoin(broadcast(nd))
      .withColumn("rk", row_number().over(graft.Windows.bounded(col("day"))))
      .where(col("rk") === expr(s"CAST(ceil($TRAIN_FRAC * nd) AS INT)"))
      .select(col("day").as("b"))
    val tagged = e.crossJoin(broadcast(boundary))
      .withColumn("split",
        when(col("day") <= col("b"), "train")
          .when(col("day") <= col("b") + EMBARGO_DAYS, "embargo")
          .otherwise("test"))
    val tot = tagged.agg(count(lit(1)).as("n_tot"))
    tagged.groupBy("split")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct("day").as("n_days"),
        min("day").as("min_day"), max("day").as("max_day"))
      .crossJoin(broadcast(tot))
      .select(col("split"), col("n_rows"), col("n_days"),
        col("min_day"), col("max_day"),
        r4(expr("CAST(n_rows AS DOUBLE) / n_tot")).as("row_share"))
      .orderBy("split")
  }

  /** Closing formulas shared by both engines: the three exact pair
    * sums → E and the size-scaled statistic. */
  private val eStat =
    "(2e0 * sxy / (CAST(n1 AS DOUBLE) * n2) - " +
      "CAST(sxx AS DOUBLE) / (CAST(n1 AS DOUBLE) * n1) - " +
      "CAST(syy AS DOUBLE) / (CAST(n2 AS DOUBLE) * n2))"
  private val eT =
    s"(CAST(n1 AS DOUBLE) * n2 / (n1 + n2) * $eStat)"

  /** M185: ENERGY DISTANCE — per event_type, era 1 (first half of the
    * active days) vs era 2 daily counts: the three pairwise-|Δ| sums
    * exactly, then E and T = n₁n₂/(n₁+n₂)·E. E ≥ 0 always, 0 iff the
    * eras share a distribution.
    *
    * Scale shape: the pair table is calendar-bounded (≤ days² per
    * type, independent of corpus size) via a per-type equi-join; the
    * corpus-scaled work is only the daily hash agg.
    */
  val m185EnergyDistance: Q = (s, d) => {
    val daily = events(s, d)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("x"))
    val med = daily.groupBy("event_type")
      .agg(expr("CAST(percentile(2 * day, 0.5) AS BIGINT)").as("md2"))
    val tagged = daily.join(broadcast(med), "event_type")
      .withColumn("era", when(col("day") * 2 <= col("md2"), 1).otherwise(2))
    val pairs = tagged.as("a").join(tagged.as("b"), "event_type")
      .select(col("event_type"),
        col("a.era").as("ea"), col("b.era").as("eb"),
        abs(col("a.x") - col("b.x")).as("ad"))
    val cnts = tagged.groupBy("event_type")
      .agg(sum(when(col("era") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("era") === 2, 1L).otherwise(0L)).as("n2"))
    pairs.groupBy("event_type")
      .agg(
        sum(when(col("ea") === 1 && col("eb") === 2, col("ad"))
          .otherwise(0L)).as("sxy"),
        sum(when(col("ea") === 1 && col("eb") === 1, col("ad"))
          .otherwise(0L)).as("sxx"),
        sum(when(col("ea") === 2 && col("eb") === 2, col("ad"))
          .otherwise(0L)).as("syy"))
      .join(broadcast(cnts), "event_type")
      .select(col("event_type"), col("n1"), col("n2"),
        col("sxy"), col("sxx"), col("syy"),
        r4(expr(eStat)).as("e_stat"),
        r4(expr(eT)).as("t_stat"))
      .orderBy("event_type")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp73_temporal_split" -> lp73TemporalSplit,
    "m185_energy_distance" -> m185EnergyDistance)

  val oracleSql: Map[String, String] = Map(
    "lp73_temporal_split" ->
      s"""WITH e AS (
        |  SELECT event_id,
        |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM e),
        |b AS (
        |  SELECT day AS b FROM (
        |    SELECT day, row_number() OVER (ORDER BY day) AS rk,
        |      count(*) OVER () AS nd
        |    FROM days)
        |  WHERE rk = CAST(ceil($TRAIN_FRAC * nd) AS INT)),
        |tagged AS MATERIALIZED (
        |  SELECT e.event_id, e.day,
        |    CASE WHEN e.day <= b.b THEN 'train'
        |         WHEN e.day <= b.b + $EMBARGO_DAYS THEN 'embargo'
        |         ELSE 'test' END AS split
        |  FROM e CROSS JOIN b),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tot FROM tagged)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT day) AS BIGINT) AS n_days,
        |  CAST(min(day) AS BIGINT) AS min_day,
        |  CAST(max(day) AS BIGINT) AS max_day,
        |  round(CAST(count(*) AS DOUBLE) / any_value(n_tot), 4) AS row_share
        |FROM tagged CROSS JOIN tot
        |GROUP BY split ORDER BY split""".stripMargin,
    "m185_energy_distance" ->
      s"""WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type,
        |    CAST(quantile_cont(2 * day, 0.5) AS BIGINT) AS md2
        |  FROM daily GROUP BY 1),
        |tagged AS MATERIALIZED (
        |  SELECT d.event_type, d.x,
        |    CASE WHEN d.day * 2 <= m.md2 THEN 1 ELSE 2 END AS era
        |  FROM daily d JOIN med m USING (event_type)),
        |pairs AS (
        |  SELECT a.event_type, a.era AS ea, b.era AS eb,
        |    abs(a.x - b.x) AS ad
        |  FROM tagged a JOIN tagged b USING (event_type)),
        |cnts AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN era = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM tagged GROUP BY 1),
        |agg AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN ea = 1 AND eb = 2 THEN ad ELSE 0 END)
        |      AS BIGINT) AS sxy,
        |    CAST(sum(CASE WHEN ea = 1 AND eb = 1 THEN ad ELSE 0 END)
        |      AS BIGINT) AS sxx,
        |    CAST(sum(CASE WHEN ea = 2 AND eb = 2 THEN ad ELSE 0 END)
        |      AS BIGINT) AS syy
        |  FROM pairs GROUP BY 1),
        |fin AS (
        |  SELECT a.event_type, c.n1, c.n2, a.sxy, a.sxx, a.syy
        |  FROM agg a JOIN cnts c USING (event_type))
        |SELECT event_type, n1, n2, sxy, sxx, syy,
        |  round($eStat, 4) AS e_stat,
        |  round($eT, 4) AS t_stat
        |FROM fin ORDER BY event_type""".stripMargin)
}
