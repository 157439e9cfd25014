package graft.queries

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.{Orc, Tables}

/** Round-6 wave 10: ingestion hardening (malformed-record policies on
  * the CSV path) and the time-range join via interval bucketing.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.1 (sources), §2.3 (joins).
  */
object SurfaceR6m extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- S18: malformed CSV handling ----

  /** S18: DROPMALFORMED ingestion — a landing file is rebuilt from the
    * nation fixture with three corrupt lines spliced in (wrong arity,
    * type error, trailing garbage), then read back with an explicit
    * schema and the drop policy. The oracle is the clean fixture itself,
    * so the parser's good/bad partition is hash-checked. At 100 TB the
    * same reader runs with PERMISSIVE + a `_corrupt_record` quarantine
    * column instead (dropping silently loses forensic signal); the spec
    * exercises that mode.
    */
  /** The three corrupt lines spliced into the landing file (wrong
    * arity, type error, trailing garbage) — shared with the PERMISSIVE
    * quarantine spec so the expected bad-set can't drift. */
  val s18BadLines: Seq[String] =
    Seq("999", "x,BADKEY,7", "12,TRAILING,3,extra,cols")

  /** Writes the s18 landing file (clean nation rows + [[s18BadLines]])
    * to a fresh UUID tmpdir and returns its path. Exposed so the spec
    * can re-read the SAME file in PERMISSIVE mode. */
  def s18WriteLanding(s: SparkSession, d: String): String = {
    // tmpdir-unique landing path: CWD-relative paths collide across
    // working directories or concurrent drives
    val dir = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_s18_csv_${java.util.UUID.randomUUID().toString.take(8)}")
    Files.createDirectories(dir)
    // downstream reads are LAZY — the landing file must survive until
    // the caller consumes the DataFrame, so cleanup is JVM-exit (file
    // registered after dir: deleteOnExit runs in reverse order)
    dir.toFile.deleteOnExit()
    dir.resolve("landing.csv").toFile.deleteOnExit()
    val good = nation(s, d)
      .orderBy("n_nationkey")
      .collect()
      .map(r => s"${r.getInt(0)},${r.getString(1)},${r.getInt(2)}")
    val lines = (good.take(10) ++ s18BadLines ++ good.drop(10)).mkString("\n")
    Files.write(dir.resolve("landing.csv"),
      lines.getBytes(StandardCharsets.UTF_8))
    dir.resolve("landing.csv").toString
  }

  val s18CsvMalformed: Q = (s, d) => {
    val landing = s18WriteLanding(s, d)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    s.read.schema(schema).option("mode", "DROPMALFORMED")
      .csv(landing)
      .orderBy("n_nationkey")
  }

  // ---- J13: time-range join ----

  /** J13: errors within ±5 minutes of any purchase — the interval/range
    * join. Candidates come from 300-second epoch buckets (each purchase
    * probes its bucket and both neighbors, so a ±300 s match can never
    * escape — same recall-by-construction argument as j12/j9b), and the
    * exact integer-microsecond predicate verifies. The bucketed
    * equi-join is THE range-join shape at scale: cost is candidate-
    * bounded, AQE can split hot buckets, and nothing is O(n²). All
    * arithmetic is integer microseconds to dodge float epoch
    * divergence; the oracle brute-forces the cross product.
    */
  val j13TimeRangeJoin: Q = (s, d) => {
    val e = events(s, d).select(col("event_id"), col("ts"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val widthUs = 300L * 1000000L
    val purchases = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("us").as("p_us"))
      .withColumn("probe", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("bucket", floor(col("p_us") / widthUs) + col("probe"))
    val errors = e.where(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("us").as("e_us"))
      .withColumn("bucket", floor(col("e_us") / widthUs))
    // an error lives in exactly one bucket and each purchase probes it
    // once, so pairs are already unique — no dedup shuffle needed
    purchases.join(errors, "bucket")
      .where(abs(col("p_us") - col("e_us")) < widthUs)
      .select(col("p_id"), col("e_id"),
        (col("e_us") - col("p_us")).as("lag_us"))
      .orderBy("p_id", "e_id")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "s18_csv_malformed" -> s18CsvMalformed,
    "j13_time_range_join" -> j13TimeRangeJoin)

  val oracleSql: Map[String, String] = Map(
    "s18_csv_malformed" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "j13_time_range_join" ->
      """WITH e AS (
        |  SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
        |  FROM events)
        |SELECT p.event_id AS p_id, x.event_id AS e_id,
        |  CAST(x.us - p.us AS BIGINT) AS lag_us
        |FROM e p JOIN e x
        |  ON p.event_type = 'purchase' AND x.event_type = 'error'
        | AND abs(p.us - x.us) < 300 * 1000000
        |ORDER BY p_id, e_id""".stripMargin)
}
