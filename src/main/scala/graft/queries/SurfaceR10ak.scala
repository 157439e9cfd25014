package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

import graft.{Orc, Tables}

/** Round-10 surface batch 37: two series/source closers — maximum
  * drawdown (the worst peak-to-trough of a daily series, w14's risk
  * twin) and recursive-directory file reads (ingesting a feed whose
  * files arrive in arbitrary nested layouts).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.6 (windows), §2.1 (sources).
  */
object SurfaceR10ak extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- W16: maximum drawdown ----

  private val ddSql = "(1.0 - CAST(cents AS DOUBLE) / runmax)"

  /** W16: MAX DRAWDOWN — per return flag, the deepest relative drop of
    * daily revenue from its running peak, with the day it bottomed
    * (ties to the earliest day). The risk statistic quoted next to any
    * growth index (w14): a series can compound nicely and still have
    * spent a quarter underwater. Running max over the bounded daily
    * aggregate; the drawdown ratio divides exact integer cents, so the
    * ranking cut needs no rounding at all — both engines rank the
    * identical doubles. */
  val w16MaxDrawdown: Q = (s, d) => {
    val daily = lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_shipdate").cast("date").as("day"))
      .agg(floor(sum(col("l_extendedprice")) * 100 + lit(0.5)).cast("long")
        .as("cents"))
    val wCum = Window.partitionBy("flag").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRank = Window.partitionBy("flag")
      .orderBy(col("dd").desc, col("day").asc)
    daily
      .withColumn("runmax", max("cents").over(wCum))
      .withColumn("dd", expr(ddSql))
      .withColumn("rk", row_number().over(wRank))
      .where(col("rk") === 1)
      .select(col("flag"), col("day").as("trough_day"),
        r4(col("dd")).as("max_drawdown"))
      .orderBy("flag")
  }

  // ---- S26: recursive directory read ----

  /** S26: RECURSIVE FILE LOOKUP — nation written into two UNRELATED
    * nested subdirectories (the layout a drop-box feed actually has:
    * uploaders invent their own paths), read back in one pass with
    * `recursiveFileLookup` — no partition-column inference, just
    * "every parquet file under this prefix". The companion to s6's
    * disciplined partitioned layout for feeds that have none.
    * Oracle = one copy of the fixture per subdirectory. */
  val s26RecursiveLookup: Q = (s, d) => {
    val base = new java.io.File("target/tmp/s26_recursive")
    val out = base.getAbsolutePath
    nation(s, d).write.mode("overwrite").parquet(s"$out/feed_a/2024/01")
    nation(s, d).write.mode("overwrite").parquet(s"$out/feed_b/upload_7")
    s.read
      .schema(StructType.fromDDL("n_nationkey INT, n_name STRING, n_regionkey INT"))
      .option("recursiveFileLookup", "true")
      .parquet(out)
      .groupBy("n_nationkey", "n_name", "n_regionkey")
      .agg(count(lit(1)).as("n_copies"))
      .orderBy("n_nationkey")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "w16_max_drawdown" -> w16MaxDrawdown,
    "s26_recursive_lookup" -> s26RecursiveLookup)

  val oracleSql: Map[String, String] = Map(
    "w16_max_drawdown" ->
      s"""WITH daily AS (
        |  SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS day,
        |    CAST(floor(sum(l_extendedprice) * 100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1, 2),
        |peaks AS (
        |  SELECT flag, day, cents,
        |    max(cents) OVER (PARTITION BY flag ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
        |  FROM daily),
        |dd_t AS (
        |  SELECT flag, day, $ddSql AS dd FROM peaks),
        |ranked AS (
        |  SELECT flag, day, dd,
        |    row_number() OVER (PARTITION BY flag ORDER BY dd DESC, day)
        |      AS rk
        |  FROM dd_t)
        |SELECT flag, day AS trough_day, round(dd, 4) AS max_drawdown
        |FROM ranked WHERE rk = 1 ORDER BY flag""".stripMargin,
    "s26_recursive_lookup" ->
      """SELECT n_nationkey, n_name, n_regionkey,
        |  CAST(2 AS BIGINT) AS n_copies
        |FROM nation ORDER BY n_nationkey""".stripMargin)
}
