package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 99: Gumbel block-maxima fitting with return
  * levels, and an order-invariant dataset fingerprint.
  *
  * Contrast with near-siblings: a35 (Hill) estimates the tail INDEX
  * from upper order statistics — "how heavy is the tail"; the Gumbel
  * block-maxima fit answers the operational question — "what daily
  * peak should we provision for once in N periods" — by fitting the
  * extreme-value location/scale to per-week maxima (method of
  * moments) and inverting the CDF at 1−1/N. f9 hashes ROWS; lp69
  * fingerprints a DATASET: the sum of per-row md5-derived integers
  * mod 2⁶³−1 is invariant to row order and partitioning, additive over
  * disjoint unions, and sensitive to any single-cell change — the
  * cheap equality certificate for verifying a 100 TB copy without
  * sorting either side (and the additivity is what makes it
  * incrementally maintainable under appends).
  *
  * Float discipline: weekly maxima are exact integers; the Gumbel
  * moments and return level are one shared closed form (β = s·√6/π
  * uses an explicit pi() both engines evaluate identically). The
  * fingerprint is pure integer arithmetic on md5 nibbles.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.13 (EVT) and §2.10 (pipeline utilities); siblings
  * a35, f9, lp5 md5 idiom.
  */
object SurfaceR10cu extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // Gumbel method of moments over (k blocks, sum sm, sumsq qm):
  // s² = (qm − sm²/k)/(k−1); β = s√6/π; μ = m̄ − γβ (γ Euler–Mascheroni).
  //
  // The mean and β are contraction-safe chains (no multiply feeding an
  // add, so C++ FMA fusion cannot perturb them) and are QUANTIZED to
  // 1e-4 BIGINTs first; μ and the return levels then live in exact
  // integer 1e-4 units — the raw μ = m̄ − γβ form is the a − b·c shape
  // whose fused evaluation differed from the JVM by one ulp exactly on
  // an r4 boundary in the r10 drive (372.24905).
  private val gmMean = "(CAST(sm AS DOUBLE) / k)"
  private val gmSd =
    "sqrt((CAST(qm AS DOUBLE) - CAST(sm AS DOUBLE) * sm / k) / (k - 1))"
  private val gmBeta = s"($gmSd * sqrt(6.0) / pi())"
  private val gmMq = s"CAST(floor($gmMean * 1e4 + 0.5) AS BIGINT)"
  private val gmBq = s"CAST(floor($gmBeta * 1e4 + 0.5) AS BIGINT)"
  private val gmMuQ =
    s"($gmMq - CAST(floor(0.5772156649015329 * $gmBq + 0.5) AS BIGINT))"
  private def gmRlQ(n: Int) = {
    val L = math.log(-math.log(1.0 - 1.0 / n)) // exact literal both engines
    s"($gmMuQ - CAST(floor($L * $gmBq + 0.5) AS BIGINT))"
  }

  /** M179: GUMBEL BLOCK MAXIMA — weekly maxima of the daily event
    * count, fit by moments; readout: location, scale, and the 10- and
    * 52-week return levels (the "provision for this peak" numbers).
    *
    * Scale shape: facts → daily agg → weekly max agg (both
    * calendar-bounded), one moment row, closed forms.
    */
  val m179GumbelEvd: Q = (s, d) => {
    val daily = events(s, d)
      .select(expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)")
        .as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
    val weekly = daily.withColumn("wk", expr("day DIV 7"))
      .groupBy("wk").agg(max("y").as("mx"))
    weekly.agg(count(lit(1)).as("k"), sum("mx").as("sm"),
        sum(expr("mx * mx")).as("qm"))
      .select(col("k"),
        expr(s"CAST($gmMuQ AS DOUBLE) / 10000.0").as("mu"),
        expr(s"CAST($gmBq AS DOUBLE) / 10000.0").as("beta"),
        expr(s"CAST(${gmRlQ(10)} AS DOUBLE) / 10000.0").as("rl_10"),
        expr(s"CAST(${gmRlQ(52)} AS DOUBLE) / 10000.0").as("rl_52"))
  }

  // Row fingerprint: first 12 md5 nibbles of the canonical row string
  // as a 48-bit integer (nibble decode via the shared instr lookup).
  // 48 bits keeps Σh far from BIGINT overflow at fixture scales under
  // ANSI arithmetic; at cluster scale aggregate with per-partition
  // mod-p partial sums (sum is associative mod p).
  private val fpH = (1 to 12).map(i =>
    s"(instr('0123456789abcdef', substr(hv, $i, 1)) - 1)")
    // seed the fold in BIGINT: Spark's instr returns INT and the raw
    // product chain overflows 32 bits under ANSI (DuckDB's instr is
    // already BIGINT, so the cast is a no-op there)
    .reduceLeft((acc, n) =>
      if (acc.startsWith("(instr")) s"(CAST($acc AS BIGINT) * 16 + $n)"
      else s"($acc * 16 + $n)")

  /** LP69: DATASET FINGERPRINT — per source: the row count and the
    * sum of 48-bit row hashes (canonical "doc_id|lang|n_chars|text"
    * md5) mod p = 2⁶³−1, plus the whole-corpus line. Order- and
    * partitioning-invariant, additive over disjoint unions (the
    * corpus fingerprint must equal the per-source fingerprint sum
    * mod p — the spec law), and any single-cell mutation flips it
    * (spec negative control).
    */
  val lp69DatasetFingerprint: Q = (s, d) => {
    val rows = documents(s, d)
      .select(col("source"),
        md5(concat_ws("|", col("doc_id"), col("lang"), col("n_chars"),
          col("text")).cast("binary")).as("hv"))
      .select(col("source"), expr(fpH).as("h"))
    val per = rows.groupBy("source")
      .agg(count(lit(1)).as("n_rows"),
        expr("sum(h) % 9223372036854775807").as("fingerprint"))
    val all = rows.agg(count(lit(1)).as("n_rows"),
        expr("sum(h) % 9223372036854775807").as("fingerprint"))
      .select(lit("ALL").as("source"), col("n_rows"), col("fingerprint"))
    per.select(col("source"), col("n_rows"), col("fingerprint"))
      .unionAll(all)
      .orderBy("source")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m179_gumbel_evd" -> m179GumbelEvd,
    "lp69_dataset_fingerprint" -> lp69DatasetFingerprint)

  val oracleSql: Map[String, String] = Map(
    "m179_gumbel_evd" ->
      s"""WITH daily AS (
         |  SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
         |    CAST(count(*) AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |weekly AS (
         |  SELECT day // 7 AS wk, CAST(max(y) AS BIGINT) AS mx
         |  FROM daily GROUP BY 1),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS k,
         |    CAST(sum(mx) AS BIGINT) AS sm,
         |    CAST(sum(mx * mx) AS BIGINT) AS qm
         |  FROM weekly)
         |SELECT k,
         |  CAST($gmMuQ AS DOUBLE) / 10000.0 AS mu,
         |  CAST($gmBq AS DOUBLE) / 10000.0 AS beta,
         |  CAST(${gmRlQ(10)} AS DOUBLE) / 10000.0 AS rl_10,
         |  CAST(${gmRlQ(52)} AS DOUBLE) / 10000.0 AS rl_52
         |FROM m""".stripMargin,
    "lp69_dataset_fingerprint" ->
      s"""WITH rows_h AS (
         |  SELECT source,
         |    md5(CAST(doc_id AS VARCHAR) || '|' || lang || '|' ||
         |        CAST(n_chars AS VARCHAR) || '|' || text) AS hv
         |  FROM documents),
         |vals AS (
         |  SELECT source, $fpH AS h FROM rows_h),
         |per AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(sum(h) % 9223372036854775807 AS BIGINT) AS fingerprint
         |  FROM vals GROUP BY 1),
         |allr AS (
         |  SELECT 'ALL' AS source, CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(sum(h) % 9223372036854775807 AS BIGINT) AS fingerprint
         |  FROM vals)
         |SELECT * FROM per UNION ALL SELECT * FROM allr
         |ORDER BY source""".stripMargin)
}
