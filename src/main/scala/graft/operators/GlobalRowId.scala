package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global 0-based ordinal by a (near-)unique key WITHOUT the
  * single-partition window.
  *
  * `row_number() OVER (ORDER BY key)` is the textbook way to assign
  * training-example ids — and a guaranteed scale-killer: Spark plans an
  * empty-partition-spec window as Exchange SinglePartition, funnelling
  * 100 TB through ONE task. The distributed equivalent is the classic
  * two-pass offset scheme:
  *
  *  1. `repartitionByRange(key)` — partitions hold ordered,
  *     NON-OVERLAPPING key ranges (sampled boundaries; deterministic
  *     for a fixed input, and the exchange is planned once — both
  *     consumers below reuse it);
  *  2. per-partition row counts → cumulative offsets. This aggregate is
  *     numPartitions rows, so ITS single-partition cumsum window is
  *     over a scalar-sized relation — the only data ever funnelled to
  *     one task;
  *  3. local rank via `row_number() OVER (PARTITION BY pid ORDER BY
  *     key)` — parallel, one window per range partition;
  *  4. rowid = offset(pid) + local − 1, offsets broadcast.
  *
  * Ordinal equals the global `ORDER BY key` rank when `key` is unique
  * (ties within a partition are broken arbitrarily, and ties could
  * straddle a range boundary — pass a unique key, e.g. a primary key or
  * a content hash).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.10 (pipeline utilities) — example-id assignment for
  * shard manifests / sequence packing.
  */
object GlobalRowId {

  def withRowId(
      df: DataFrame,
      key: String,
      numPartitions: Int = 0,
      outCol: String = "rowid"): DataFrame =
    withRowIdCols(df, Seq(key), numPartitions, outCol)

  /** Multi-column variant: ordinal by the lexicographic order of `keys`
    * (pass enough trailing tie-break columns to make the tuple unique —
    * same caveat as the single-key form). Used by a30's equi-depth
    * histogram, where the sort key is (value, pk...) rather than a pk. */
  def withRowIdCols(
      df: DataFrame,
      keys: Seq[String],
      numPartitions: Int = 0,
      outCol: String = "rowid"): DataFrame = {
    // numPartitions <= 0 = scale-adaptive (same rationale as PrefixSum:
    // derive from the deployment, not a constant tuned for one box);
    // rowids are partition-count-independent for unique keys
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    // Eagerly materialized for the same reason as PrefixSum: the
    // offsets subtree and the rank subtree must see ONE boundary
    // sample, not two — ReuseExchange usually dedupes the range
    // shuffle, but correctness must not hinge on it (a divergent
    // resample was observed on PrefixSum's identical structure).
    val ranged = df.repartitionByRange(parts, keys.map(col): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = ranged
      .groupBy("_pid").agg(count(lit(1)).as("_n"))
      .withColumn("_off",
        coalesce(
          sum("_n").over(graft.Windows.bounded(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_pid", "_off")
    val local = row_number()
      .over(Window.partitionBy("_pid").orderBy(keys.map(col): _*))
    ranged
      .withColumn("_local", local)
      .join(broadcast(offsets), "_pid")
      .withColumn(outCol, col("_off") + col("_local") - 1)
      .drop("_pid", "_local", "_n", "_off")
  }
}
