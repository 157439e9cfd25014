package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.{Orc, Tables}

/** Round-10 surface batch 104: the variance-inflation-factor design
  * audit and the Bloom-filter calibration audit.
  *
  * Contrast with near-siblings: m155 (partial correlation) answers one
  * PAIR question — is the y–z link real after controlling t; m182
  * audits the DESIGN — for each of three regressors, how much its
  * coefficient variance inflates because the OTHER TWO jointly predict
  * it (VIFⱼ = 1/(1−R²ⱼ·rest)), the pre-fit collinearity gate every
  * regression pipeline (m5/m168/m173) should consult. m145/m121 test
  * RESIDUAL pathologies after a fit; VIF is a property of the design
  * matrix before any fit. a41 vs l13b: l13b USES a bloom as a plan-
  * level prefilter whose false positives an exact join removes
  * (correctness never depends on the filter); a41 AUDITS the sketch
  * itself via `df.stat.bloomFilter` — the no-false-negative law and
  * the measured false-positive rate against the configured fpp, the
  * calibration readout that decides whether a bloom prefilter is
  * worth shipping (the a3/a16 HLL and a20 count-min audit pattern,
  * applied to the membership sketch).
  *
  * Float discipline: all ten VIF sums are exact — cents/hundredths
  * BIGINTs with cross-products in DECIMAL(38,0)/HUGEINT — and the
  * pairwise r / R² / VIF chain is shared closing text (the m155
  * idiom). The bloom row's exact columns (member/probe counts, hit
  * count) are integers; the calibration verdict is a boolean the
  * oracle states as the law it must equal.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 (model diagnostics) and §2.4 (sketches);
  * siblings m155 (SurfaceR10bs), m145/m121, a3/a16/a20, l13b
  * (SurfaceR8).
  */
object SurfaceR10cz extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M182: variance inflation factors ----

  /** Pairwise r from the exact sums (m155 shape: numerator and the two
    * sqrt legs in doubles cast from exact integers). */
  private def rr(u: String, v: String, uv: String) =
    s"((n * CAST(s$uv AS DOUBLE) - CAST(s$u AS DOUBLE) * s$v) / " +
      s"(sqrt(n * CAST(s$u$u AS DOUBLE) - CAST(s$u AS DOUBLE) * s$u) * " +
      s"sqrt(n * CAST(s$v$v AS DOUBLE) - CAST(s$v AS DOUBLE) * s$v)))"
  private val rXY = rr("x", "y", "xy")
  private val rXZ = rr("x", "z", "xz")
  private val rYZ = rr("y", "z", "yz")
  /** R²ⱼ of predictor j on the other two, then VIFⱼ = 1/(1−R²ⱼ). */
  private def vif(rjk: String, rjl: String, rkl: String) =
    s"(1e0 / (1e0 - ($rjk * $rjk + $rjl * $rjl - " +
      s"2e0 * $rjk * $rjl * $rkl) / (1e0 - $rkl * $rkl)))"
  private val vifX = vif(rXY, rXZ, rYZ)
  private val vifY = vif(rXY, rYZ, rXZ)
  private val vifZ = vif(rXZ, rYZ, rXY)

  /** M182: VIF — quantity / extended price / discount as the design
    * matrix (price ≈ quantity × unit price makes the first two
    * genuinely collinear). One row: n, the three VIFs, the max, and
    * the >5 rule-of-thumb flag.
    *
    * Scale shape: ONE hash-agg pass over the scan collects all ten
    * sums (count + 3 first moments + 6 cross/second moments), then a
    * 1-row closing formula — the m155/m7-family plan; nothing scales
    * past the scan.
    */
  val m182Vif: Q = (s, d) => {
    lineitem(s, d)
      .select(
        expr("CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)").as("x"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("y"),
        expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("z"))
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("CAST(z AS DECIMAL(38,0)) * z")).as("szz"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * z")).as("sxz"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * z")).as("syz"))
      .select(col("n"),
        r4(expr(vifX)).as("vif_quantity"),
        r4(expr(vifY)).as("vif_price"),
        r4(expr(vifZ)).as("vif_discount"),
        r4(expr(s"greatest($vifX, $vifY, $vifZ)")).as("max_vif"),
        expr(s"greatest($vifX, $vifY, $vifZ) > 5e0").as("collinear_flag"))
  }

  // ---- A41: Bloom filter calibration audit ----

  private val FPP = 0.03

  /** A41: BLOOM AUDIT — build `df.stat.bloomFilter` over the custkeys
    * that placed orders, probe EVERY customer: members must all hit
    * (no false negatives — exact law), and the false-positive rate
    * over non-members must sit under 2× the configured fpp. Columns:
    * member / non-member counts (exact), hits among members (exact =
    * n_members), and the calibration verdict.
    *
    * Scale shape: the build is Spark's treeAggregate over the key
    * column (map-side partial blooms OR-merged up — no shuffle of
    * keys); the probe broadcasts the filter bits inside the predicate.
    * This is the audit for the l13b-style prefilter pattern; the
    * filter's size is set by expectedNumItems from a first exact
    * count, the two-pass build a production pipeline would run.
    */
  val a41BloomFilter: Q = (s, d) => {
    val members = orders(s, d)
      .select(col("o_custkey").cast("long").as("k")).distinct()
    val nMembers = members.count()
    val bloom: BloomFilter =
      members.stat.bloomFilter("k", math.max(nMembers, 1L), FPP)
    val bc = s.sparkContext.broadcast(bloom)
    val hit = udf((k: Long) => bc.value.mightContain(k))
    val probed = customer(s, d)
      .select(col("c_custkey").cast("long").as("k"))
      .join(members.withColumn("is_member", lit(true)), Seq("k"), "left")
      .select(col("k"), coalesce(col("is_member"), lit(false)).as("m"),
        hit(col("k")).as("h"))
    probed.agg(
        sum(when(col("m"), 1L).otherwise(0L)).as("n_members"),
        sum(when(!col("m"), 1L).otherwise(0L)).as("n_nonmembers"),
        sum(when(col("m") && col("h"), 1L).otherwise(0L)).as("member_hits"),
        sum(when(!col("m") && col("h"), 1L).otherwise(0L)).as("fp"))
      .select(col("n_members"), col("n_nonmembers"), col("member_hits"),
        expr(s"CASE WHEN n_nonmembers = 0 THEN TRUE " +
          s"ELSE CAST(fp AS DOUBLE) / n_nonmembers <= 2 * $FPP END")
          .as("fpr_within_2x"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m182_vif" -> m182Vif,
    "a41_bloom_filter" -> a41BloomFilter)

  val oracleSql: Map[String, String] = Map(
    "m182_vif" ->
      s"""WITH q AS (
        |  SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y,
        |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS z
        |  FROM lineitem),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(z) AS BIGINT) AS sz,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
        |    CAST(sum(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(x AS HUGEINT) * z) AS HUGEINT) AS sxz,
        |    CAST(sum(CAST(y AS HUGEINT) * z) AS HUGEINT) AS syz
        |  FROM q)
        |SELECT n,
        |  round($vifX, 4) AS vif_quantity,
        |  round($vifY, 4) AS vif_price,
        |  round($vifZ, 4) AS vif_discount,
        |  round(greatest($vifX, $vifY, $vifZ), 4) AS max_vif,
        |  greatest($vifX, $vifY, $vifZ) > 5e0 AS collinear_flag
        |FROM m""".stripMargin,
    "a41_bloom_filter" ->
      """WITH members AS (
        |  SELECT DISTINCT o_custkey AS k FROM orders),
        |probed AS (
        |  SELECT c.c_custkey AS k, m.k IS NOT NULL AS is_m
        |  FROM customer c LEFT JOIN members m ON m.k = c.c_custkey)
        |SELECT
        |  CAST(sum(CASE WHEN is_m THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
        |  CAST(sum(CASE WHEN is_m THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_nonmembers,
        |  CAST(sum(CASE WHEN is_m THEN 1 ELSE 0 END) AS BIGINT)
        |    AS member_hits,
        |  TRUE AS fpr_within_2x
        |FROM probed""".stripMargin)
}
