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
      numPartitions: Int = 0,
      outCol: String = "running_total"): DataFrame =
    withRunningTotals(df, sortCols, Seq(valueCol -> outCol), numPartitions)

  /** Multi-column variant: one range exchange + one checkpoint carries
    * ALL the running totals (valueCol → outCol pairs) — N cumulative
    * series over the same global order must not pay N materializations
    * (the two-sample ECDF in m46 needs both series in lockstep). */
  def withRunningTotals(
      df: DataFrame,
      sortCols: Seq[String],
      valueOutCols: Seq[(String, String)],
      numPartitions: Int = 0): DataFrame = {
    require(valueOutCols.nonEmpty,
      "withRunningTotals needs at least one (valueCol, outCol) pair")
    // numPartitions <= 0 = scale-adaptive (guide §2: derive partitioning
    // from the deployment, not a constant tuned for one box): the old
    // fixed 32 over-partitioned small runs and under-partitioned big
    // ones. Results are partition-count-independent for the documented
    // total-order sort-key contract.
    val parts = if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    // Temp columns are keyed by INDEX, not by the value column's name —
    // a duplicated value column (two series over the same input) or a
    // caller column that happens to be named like a temp would otherwise
    // collide into an ambiguous-attribute AnalysisException.
    val idx = valueOutCols.zipWithIndex
    // The offsets subtree and the main subtree BOTH consume `ranged`.
    // repartitionByRange samples its boundaries, and when the two
    // consumers are not deduped into one exchange (plan-dependent —
    // observed under the Verify driver), each evaluation can sample
    // DIFFERENT boundaries, making offsets inconsistent with local
    // ranks. An eager localCheckpoint pins one materialization that
    // both consumers read — correctness must not depend on
    // ReuseExchange firing.
    val ranged = df.repartitionByRange(parts, sortCols.map(col): _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val partSums = idx.map { case ((v, _), i) => sum(v).as(s"_n_$i") }
    val offsets = ranged
      .groupBy("_pid")
      .agg(partSums.head, partSums.tail: _*)
      .select(col("_pid") +: idx.map { case (_, i) =>
        coalesce(
          sum(s"_n_$i").over(graft.Windows.bounded(col("_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as(s"_off_$i")
      }: _*)
    val localW = Window.partitionBy("_pid").orderBy(sortCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocals = idx.foldLeft(ranged) { case (acc, ((v, _), i)) =>
      acc.withColumn(s"_local_$i", sum(v).over(localW))
    }
    val joined = withLocals.join(broadcast(offsets), "_pid")
    idx.foldLeft(joined) { case (acc, ((_, out), i)) =>
      acc.withColumn(out, col(s"_off_$i") + col(s"_local_$i"))
    }.drop("_pid")
      .drop(idx.flatMap { case (_, i) =>
        Seq(s"_local_$i", s"_off_$i") }: _*)
  }
}
