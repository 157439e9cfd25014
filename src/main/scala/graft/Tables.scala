package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture table readers.
  *
  * Single entry point for every query: all scans go through here so that
  * scan-level concerns (the events nanos shim, schema expectations) are
  * centralized. At 100 TB these would be catalog tables with partition
  * pruning; on the fixtures they are single parquet files, and the same
  * `spark.read.parquet` path scales to multi-file partitioned layouts
  * unchanged.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); the table set
  * derives from the driver fixtures (FIXTURES.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings")

  /** Plain parquet scan. Column pruning + predicate pushdown arrive via
    * Catalyst; callers just declare select/filter.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS) which Spark 4
    * rejects by default (PARQUET_TYPE_ILLEGAL). Read it as raw nanos via the
    * legacy flag, then rebuild a TimestampType truncated to micros with
    * integer division (`div`, not `/`: double division of epoch-nanos loses
    * precision past 2^53 and can shift a value by ±1 µs).
    * DuckDB oracles use `CAST(ts AS TIMESTAMP)` for the same truncation.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
