package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping —
  * the layout half of the lakehouse story: [[TableStats]] zone maps can
  * only prune files whose min/max ranges are NARROW, and a sort on one
  * column leaves every other column's per-file range full-width. The
  * Morton curve interleaves the bits of two key columns so that files
  * cut from contiguous z-ranges are LOCALITY BLOCKS in (x, y) space —
  * a box predicate on EITHER column (or both) prunes most files.
  *
  * The encode is a pure static expression tree (shift/and/or on
  * BIGINT), so it whole-stage-codegens and never leaves the scan
  * projection. Bit spreading uses the classic magic-mask doubling
  * sequence (public-domain "Interleave bits by Binary Magic Numbers",
  * Sean Eron Anderson's Bit Twiddling Hacks; also the layout strategy
  * of Delta Lake's OPTIMIZE ZORDER BY and Databricks' liquid
  * clustering — reimplemented here from the published technique).
  *
  * Contrast with [[Layout.writeZOrdered]] (lp31): Layout wraps the
  * interleave for CONTINUOUS domains — broadcast min/max bounds,
  * linear bucketization, then write; this object exposes the raw
  * fixed-width interleave as a reusable `Column` plus a
  * frame-returning `cluster` that composes with [[VersionedTable]] /
  * [[TableStats]] instead of writing directly. One interleave
  * implementation serves both: `Layout.zValue` delegates here for its
  * 16-bit default.
  *
  * Scale shape: clustering = ONE range-shuffle on the z-value (the same
  * cost as any global sort-write), after which selective scans prune at
  * file granularity forever. At 100 TB the range shuffle is the
  * standard sort-based write path; no all-pairs or driver-side step
  * exists anywhere.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.11 + the 100 TB efficiency brief.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit value (bits at positions 0,2,4,…,30). Input is masked to
    * 16 bits first, so any non-negative value is safe to pass. */
  def spread16(c: Column): Column = {
    val masks = Seq(
      (8, 0x00FF00FFL),
      (4, 0x0F0F0F0FL),
      (2, 0x33333333L),
      (1, 0x55555555L))
    masks.foldLeft(c.cast("bigint").bitwiseAND(lit(0xFFFFL))) {
      case (acc, (sh, m)) => acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(m))
    }
  }

  /** 32-bit Morton code of two 16-bit non-negative keys: x on even
    * bits, y on odd bits. Monotone locality: nearby (x, y) points land
    * on nearby z values, so contiguous z-ranges are 2-D tiles. */
  def morton2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1)).as("zval")

  /** Range-cluster `df` into `numFiles` output partitions by the Morton
    * code of (`xCol`, `yCol`) — each written file then covers one
    * contiguous z-range, i.e. a bounded tile of (x, y) space. The
    * helper column is dropped before the caller writes. */
  def cluster(df: DataFrame, xCol: String, yCol: String, numFiles: Int): DataFrame =
    df.withColumn("_graft_z", morton2(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
}
