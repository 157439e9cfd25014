package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support (SURVEY.md §4.3): pre-shuffle fact tables by
  * their join key ONCE at write time so every subsequent join on that
  * key is shuffle-free — at 100 TB this converts the nightly fact⋈fact
  * join from a full-network shuffle into a local zip of matching buckets.
  *
  * Spark requires a catalog table for bucket metadata (`saveAsTable`);
  * the in-memory/default catalog works — no Hive needed.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int = 8): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two tables bucketed on their respective keys. When bucket
    * counts match, the planner elides both shuffle exchanges (and with
    * sortBy metadata, both sorts). */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    // Qualify both sides: in the typical fact⋈fact case the bucket key
    // has the SAME name on both tables, and an unqualified
    // col(k) === col(k) raises AMBIGUOUS_REFERENCE.
    spark.table(leftTable).as("l")
      .join(spark.table(rightTable).as("r"), col(s"l.$leftKey") === col(s"r.$rightKey"))
  }
}
