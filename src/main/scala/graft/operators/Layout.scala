package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Data-layout operators (SURVEY.md §4.3, 100 TB posture): at scale the
  * cheapest IO is the IO never issued, and parquet row-group min/max
  * stats only prune when the writer clustered the data. */
object Layout {

  /** Range-partition by `key` and sort within partitions before writing:
    * every output file then covers a narrow, non-overlapping key range,
    * so a selective range predicate skips whole row groups via footer
    * stats instead of scanning them (LayoutSpec measures the scan-row
    * difference vs a random layout). This is the write-side half of
    * predicate pushdown — the nightly-table layout decision. */
  def writeRangeSorted(df: DataFrame, out: String, key: String, partitions: Int = 8): Unit =
    df.repartitionByRange(partitions, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(out)
}
