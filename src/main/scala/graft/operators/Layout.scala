package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Morton (Z-order) interleave of two bucket ids: bit i of `a` lands at
    * position 2i+1, bit i of `b` at 2i. Pure shift/mask column algebra —
    * stays in whole-stage codegen, no UDF.
    *
    * The 16-bit default delegates to [[ZOrder.morton2]]'s magic-mask
    * bit spreading (≈12 expression nodes vs ≈96 for the per-bit fold —
    * same value bit-for-bit: `zValue(a, b)` places a on odd bits, which
    * is `morton2(x = b, y = a)`). The fold remains for non-default
    * widths.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    if (bits == 16) ZOrder.morton2(b, a)
    else (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Z-ORDER layout over TWO columns: a 1-D range sort prunes only its
    * own key, while the Morton curve clusters both dimensions at once —
    * a narrow predicate on EITHER column then skips most files/row
    * groups via footer stats. This is the multi-dimension half of the
    * layout decision (the same technique behind z-ordering in lakehouse
    * table formats), built here from column algebra: linear bucketization
    * against broadcast min/max bounds, bit interleave, range-partition +
    * sort on the z-value.
    *
    * Bounds come from one min/max pass joined back as a broadcast
    * literal row (no driver collect); for skewed columns substitute
    * approx-quantile bucket edges — the interleave is unchanged.
    */
  def writeZOrdered(
      df: DataFrame,
      out: String,
      colA: String,
      colB: String,
      bits: Int = 16,
      partitions: Int = 16): Unit = {
    val bounds = df.agg(
      min(col(colA)).as("_alo"), max(col(colA)).as("_ahi"),
      min(col(colB)).as("_blo"), max(col(colB)).as("_bhi"))
    val top = (1L << bits) - 1
    def bucket(v: Column, lo: Column, hi: Column): Column =
      floor((v - lo) / greatest(hi - lo, lit(1e-12)) * top).cast("long")
    df.crossJoin(broadcast(bounds))
      .withColumn("_z", zValue(
        bucket(col(colA), col("_alo"), col("_ahi")),
        bucket(col(colB), col("_blo"), col("_bhi")), bits))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z", "_alo", "_ahi", "_blo", "_bhi")
      .write.mode("overwrite").parquet(out)
  }
}
