package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

import graft.{Orc, Tables}

/** Round-10 surface batch 33: compounding window + ingest robustness —
  * the cumulative-product window (compounded growth index, spelled as
  * exp·Σln so both engines run the identical op sequence) and the
  * corrupt-file-tolerant parquet read (the option that keeps a 100 TB
  * backfill alive when one object in a million is truncated).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.6 (windows), §2.1 (sources).
  */
object SurfaceR10ag extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- W14: cumulative product window ----

  /** W14: CUMPROD — a compounded daily growth index per return flag:
    * daily revenue ratio vs the previous day, accumulated as
    * exp(Σ ln ratio). A native running product and exp-sum-log differ
    * in their float op sequences, so BOTH engines are pinned to the
    * SAME exp/ln spelling (the only cross-engine-safe form — DuckDB
    * has no product() window aggregate and Spark no cumprod, making
    * this also the portable spelling). Ratios are ratios of exact
    * integer cents; the window input is the bounded daily aggregate,
    * partitioned by flag. */
  val w14Cumprod: Q = (s, d) => {
    val daily = lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_shipdate").cast("date").as("day"))
      .agg(floor(sum(col("l_extendedprice")) * 100 + lit(0.5)).cast("long")
        .as("cents"))
    val wLag = Window.partitionBy("flag").orderBy("day")
    val wCum = Window.partitionBy("flag").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("prev", lag("cents", 1).over(wLag))
      .where(col("prev").isNotNull)
      .withColumn("lr", expr("ln(CAST(cents AS DOUBLE) / prev)"))
      .withColumn("idx", exp(sum("lr").over(wCum)))
      .select(col("flag"), col("day"),
        r4(expr("CAST(cents AS DOUBLE) / prev")).as("ratio"),
        r4(col("idx")).as("growth_index"))
      .orderBy("flag", "day")
  }

  // ---- S25: corrupt-file tolerance ----

  /** S25: CORRUPT-TOLERANT READ — nation written as parquet, one
    * garbage part file planted next to it, read back with
    * `ignoreCorruptFiles` so the scan logs-and-skips instead of
    * failing the job. At fleet scale some object in a million WILL be
    * truncated mid-upload; this option (plus the s18 permissive-CSV
    * twin) is the difference between a nightly backfill finishing and
    * an operator paged at 3am. Oracle = the intact fixture rows. */
  val s25CorruptParquet: Q = (s, d) => {
    val dir = new java.io.File("target/tmp/s25_corrupt_parquet")
    val out = dir.getAbsolutePath
    nation(s, d).write.mode("overwrite").parquet(out)
    val junk = new java.io.File(dir, "part-junk.parquet")
    val fw = new java.io.FileOutputStream(junk)
    try fw.write("this is not a parquet file".getBytes) finally fw.close()
    s.read
      .schema(StructType.fromDDL("n_nationkey INT, n_name STRING, n_regionkey INT"))
      .option("ignoreCorruptFiles", "true")
      .parquet(out)
      .orderBy("n_nationkey")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "w14_cumprod" -> w14Cumprod,
    "s25_corrupt_parquet" -> s25CorruptParquet)

  val oracleSql: Map[String, String] = Map(
    "w14_cumprod" ->
      """WITH daily AS (
        |  SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS day,
        |    CAST(floor(sum(l_extendedprice) * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1, 2),
        |lagged AS (
        |  SELECT flag, day, cents,
        |    lag(cents) OVER (PARTITION BY flag ORDER BY day) AS prev
        |  FROM daily),
        |lr_t AS (
        |  SELECT flag, day, cents, prev,
        |    ln(CAST(cents AS DOUBLE) / prev) AS lr
        |  FROM lagged WHERE prev IS NOT NULL)
        |SELECT flag, day,
        |  round(CAST(cents AS DOUBLE) / prev, 4) AS ratio,
        |  round(exp(sum(lr) OVER (PARTITION BY flag ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 4)
        |    AS growth_index
        |FROM lr_t ORDER BY flag, day""".stripMargin,
    "s25_corrupt_parquet" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")
}
