package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix MAX: running maximum of `valueCol` in the global
  * `sortCols` order, WITHOUT a single-partition window — [[PrefixSum]]'s
  * offset scheme with max in place of sum:
  *
  *  1. `repartitionByRange(sortCols)` — ordered, non-overlapping key
  *     ranges (eagerly checkpointed: the PrefixSum boundary-resample
  *     lesson applies verbatim);
  *  2. per-partition maxima → each partition's EXCLUSIVE offset is the
  *     max over all earlier partitions (numPartitions rows; the only
  *     single-partition step);
  *  3. per-partition local running max, merged with the offset via
  *     `greatest` (which skips nulls, so the first rows fall out
  *     naturally).
  *
  * `inclCol` includes the row's own value; `exclCol` is the strict
  * predecessor max and is NULL for the global first row — exactly the
  * semantics a dominance/skyline test wants ("best among everything
  * strictly before me"). Ties across a range boundary follow the
  * partition order, as with [[PrefixSum]] — pass a total-order key set
  * when exclusivity at equal keys matters, or aggregate to distinct
  * keys first (the q46 route).
  *
  * This is the at-scale form of "running extreme over the whole sorted
  * relation" (skyline sweeps, record-to-date flags, high-water marks)
  * once that relation is too big for one task.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.10 (pipeline utilities); sibling [[PrefixSum]].
  */
object PrefixMax {

  def withRunningMax(
      df: DataFrame,
      sortCols: Seq[String],
      valueCol: String,
      numPartitions: Int = 32,
      inclCol: String = "running_max",
      exclCol: String = "running_max_excl"): DataFrame = {
    val ranged = df.repartitionByRange(numPartitions, sortCols.map(col): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = ranged
      .groupBy("_pid").agg(max(valueCol).as("_pm"))
      .select(col("_pid"),
        max("_pm").over(graft.Windows.bounded(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)).as("_off"))
    val localW = Window.partitionBy("_pid").orderBy(sortCols.map(col): _*)
    ranged.join(broadcast(offsets), "_pid")
      .withColumn(inclCol, greatest(col("_off"),
        max(valueCol).over(localW
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn(exclCol, greatest(col("_off"),
        max(valueCol).over(localW
          .rowsBetween(Window.unboundedPreceding, -1))))
      .drop("_pid", "_off")
  }
}
