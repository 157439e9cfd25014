package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.{Orc, Tables}

/** Round-10 surface batch 45: experiment guardrails + CSV parser
  * tail — the sample-ratio-mismatch check (the FIRST thing a real
  * experimentation platform validates before reading any metric) and
  * the quoted-embedded-newline CSV round-trip (multiLine parsing, the
  * one CSV shape that changes Spark's execution model).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.13 (A/B analytics), §2.2 (sources).
  */
object SurfaceR10as extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M129: sample-ratio mismatch ----

  private val srmChi2 =
    "((ca - n * 0.5) * (ca - n * 0.5) / (n * 0.5) + (cb - n * 0.25) * (cb - n * 0.25) / (n * 0.25) + (cc - n * 0.25) * (cc - n * 0.25) / (n * 0.25))"

  /** M129: SAMPLE-RATIO MISMATCH — customers split 50/25/25 into arms
    * by the lp10 md5-nibble idiom (a PURE hash of custkey: assignment
    * survives repartition/retry, the property SRM exists to check),
    * then the χ² goodness-of-fit of observed arm counts against the
    * declared ratios. χ² > 7.824 (the df=2, α=0.02 critical value —
    * SRM checks run strict) means the assignment mechanism itself is
    * broken and every downstream metric is invalid. Counts exact; the
    * χ² formula is one shared text with literal ratios. */
  val m129SrmCheck: Q = (s, d) => {
    val nib =
      "(instr('0123456789abcdef', substr(md5(concat(c_custkey, ':srm')), 1, 1)) - 1)"
    customer(s, d)
      .select(expr(
        s"CASE WHEN $nib < 8 THEN 'A' WHEN $nib < 12 THEN 'B' ELSE 'C' END")
        .as("arm"))
      .agg(
        sum(expr("CASE WHEN arm = 'A' THEN 1 ELSE 0 END")).as("ca"),
        sum(expr("CASE WHEN arm = 'B' THEN 1 ELSE 0 END")).as("cb"),
        sum(expr("CASE WHEN arm = 'C' THEN 1 ELSE 0 END")).as("cc"),
        count(lit(1)).as("n"))
      .select(col("n"), col("ca"), col("cb"), col("cc"),
        r4(expr(srmChi2)).as("chi2"),
        expr(s"CAST(CASE WHEN $srmChi2 > 7.824 THEN 1 ELSE 0 END AS BIGINT)")
          .as("srm_flag"))
  }

  // ---- S27: multiline CSV round-trip ----

  /** S27: QUOTED-NEWLINE CSV — a field containing a literal newline
    * must be quoted on write and needs multiLine=true on read (which
    * disables line-splitting, so each FILE is one task — the scale
    * note: at 100 TB keep multiline CSVs as many small files or
    * convert to parquet at ingest; this query documents the behavior
    * as much as it tests it). The round-trip is verified value-wise:
    * the oracle recomputes the embedded-newline field straight from
    * the nation fixture, so any parser mangling (split rows, lost
    * quotes) hash-fails. */
  val s27MultilineCsv: Q = (s, d) => {
    val out = new java.io.File("target/tmp/s27_mlcsv").getAbsolutePath
    nation(s, d)
      .select(col("n_nationkey"),
        concat(col("n_name"), lit("\n"), lower(col("n_name"))).as("memo"))
      .write.mode("overwrite").option("header", "true").csv(out)
    s.read
      .schema(StructType.fromDDL("n_nationkey INT, memo STRING"))
      .option("header", "true").option("multiLine", "true")
      .csv(out)
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        length(col("memo")).cast("long").as("memo_len"),
        substring_index(col("memo"), "\n", 1).as("first_line"),
        substring_index(col("memo"), "\n", -1).as("second_line"))
      .orderBy("n_nationkey")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m129_srm_check" -> m129SrmCheck,
    "s27_multiline_csv" -> s27MultilineCsv)

  val oracleSql: Map[String, String] = Map(
    "m129_srm_check" -> {
      val nib =
        "(instr('0123456789abcdef', substr(md5(concat(c_custkey, ':srm')), 1, 1)) - 1)"
      s"""WITH arms AS (
        |  SELECT CASE WHEN $nib < 8 THEN 'A' WHEN $nib < 12 THEN 'B' ELSE 'C' END AS arm
        |  FROM customer),
        |agg AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS cb,
        |    CAST(sum(CASE WHEN arm = 'C' THEN 1 ELSE 0 END) AS BIGINT) AS cc,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM arms)
        |SELECT n, ca, cb, cc,
        |  round($srmChi2, 4) AS chi2,
        |  CAST(CASE WHEN $srmChi2 > 7.824 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
        |FROM agg""".stripMargin
    },
    "s27_multiline_csv" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        |  CAST(length(n_name || chr(10) || lower(n_name)) AS BIGINT) AS memo_len,
        |  n_name AS first_line,
        |  lower(n_name) AS second_line
        |FROM nation ORDER BY n_nationkey""".stripMargin)
}
