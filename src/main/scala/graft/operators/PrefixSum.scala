package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum: running total of `valueCol` in the global
  * `sortCols` order, WITHOUT a single-partition window — the weighted
  * generalization of [[GlobalRowId]]'s offset scheme:
  *
  *  1. `repartitionByRange(sortCols)` — ordered, non-overlapping key
  *     ranges;
  *  2. per-partition value totals → cumulative offsets (numPartitions
  *     rows; the only single-partition step);
  *  3. local running sum per partition, plus the broadcast offset.
  *
  * `outCol` is the INCLUSIVE prefix sum (subtract the row's own value
  * for exclusive). Rows whose sort key ties across a range boundary
  * get their partition's order (ties within the key are summed in
  * local order) — pass a total-order key set, as with GlobalRowId.
  *
  * This is the at-scale form of every "cumulative X over the whole
  * sorted relation" reporting query (AUC rank sums, Pareto shares,
  * equi-depth cuts, reach curves) once the sorted relation itself is
  * too big for one task.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.10 (pipeline utilities).
  */
object PrefixSum {

  def withRunningTotal(
      df: DataFrame,
      sortCols: Seq[String],
      valueCol: String,
      numPartitions: Int = 32,
      outCol: String = "running_total"): DataFrame = {
    // The offsets subtree and the main subtree BOTH consume `ranged`.
    // repartitionByRange samples its boundaries, and when the two
    // consumers are not deduped into one exchange (plan-dependent —
    // observed under the Verify driver), each evaluation can sample
    // DIFFERENT boundaries, making offsets inconsistent with local
    // ranks. An eager localCheckpoint pins one materialization that
    // both consumers read — correctness must not depend on
    // ReuseExchange firing.
    val ranged = df.repartitionByRange(numPartitions, sortCols.map(col): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = ranged
      .groupBy("_pid").agg(sum(valueCol).as("_n"))
      .withColumn("_off",
        coalesce(
          sum("_n").over(graft.Windows.bounded(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_pid", "_off")
    val local = sum(valueCol)
      .over(Window.partitionBy("_pid").orderBy(sortCols.map(col): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranged
      .withColumn("_local", local)
      .join(broadcast(offsets), "_pid")
      .withColumn(outCol, col("_off") + col("_local"))
      .drop("_pid", "_local", "_n", "_off")
  }
}
