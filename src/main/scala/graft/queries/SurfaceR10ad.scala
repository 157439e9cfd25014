package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.{Orc, Tables}

/** Round-10 surface batch 30: two closers — the zstd parquet sink
  * (the codec a 100 TB archive actually uses: ~snappy speed at
  * gzip-class ratios, splittable row groups) and the harmonic mean
  * (the rate-averaging aggregate the mean/geomean pair still lacked).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.1 (sinks), §2.5 (aggregation).
  */
object SurfaceR10ad extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** S24: ZSTD PARQUET — write nation compressed with zstd, read back
    * with explicit schema. Parquet+zstd is the archival default at
    * fleet scale (row groups stay independently splittable, unlike the
    * s22 gzip CSV whose files are opaque); the row exercises the codec
    * path end-to-end. Oracle = the fixture table (s2b discipline). */
  val s24ParquetZstd: Q = (s, d) => {
    val out = new java.io.File("target/tmp/s24_parquet_zstd").getAbsolutePath
    nation(s, d).write.mode("overwrite")
      .option("compression", "zstd").parquet(out)
    s.read
      .schema(StructType.fromDDL("n_nationkey INT, n_name STRING, n_regionkey INT"))
      .parquet(out)
      .orderBy("n_nationkey")
  }

  private val harmSql = "(CAST(n AS DOUBLE) / inv_sum)"

  /** A39: HARMONIC MEAN of order totals per priority — the correct
    * average for rates and unit prices (mean of "dollars per order"
    * over orders ≠ harmonic mean of order sizes over dollars; mixing
    * them is the classic ratio-aggregation bug). n/Σ(1/x) with the
    * reciprocals summed over cents-exact positive values; completes
    * the Pythagorean triple next to avg (everywhere) and the geometric
    * mean (x2's UDAF). One hash agg. */
  val a39HarmonicMean: Q = (s, d) =>
    orders(s, d)
      .select(col("o_orderpriority").as("grp"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(1.0 AS DOUBLE) / cents")).as("inv_sum"))
      .select(col("grp"), col("n"),
        r4(expr(s"$harmSql / 100.0")).as("harmonic_mean"))
      .orderBy("grp")

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "s24_parquet_zstd" -> s24ParquetZstd,
    "a39_harmonic_mean" -> a39HarmonicMean)

  val oracleSql: Map[String, String] = Map(
    "s24_parquet_zstd" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "a39_harmonic_mean" ->
      s"""WITH c AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |agg AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    sum(CAST(1.0 AS DOUBLE) / cents) AS inv_sum
        |  FROM c GROUP BY grp)
        |SELECT grp, n, round($harmSql / 100.0, 4) AS harmonic_mean
        |FROM agg ORDER BY grp""".stripMargin)
}
