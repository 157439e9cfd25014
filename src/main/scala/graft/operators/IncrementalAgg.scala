package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped count+sum materialized view
  * from a change-data-feed — the self-maintainable-view algebra
  * (count and sum admit signed deltas; avg derives as sum/count;
  * min/max do NOT — deletes can expose a new extremum, forcing a
  * per-group rescan, which is why this operator deliberately carries
  * only the self-maintainable pair).
  *
  * The feed is [[VersionedTable.changes]]'s vocabulary: insert /
  * update_postimage contribute (+1, +value); delete / update_preimage
  * contribute (−1, −value). An update that MOVES a row between groups
  * therefore transfers its contribution automatically (the preimage
  * subtracts from the old group, the postimage adds to the new one),
  * and a group whose count reaches zero drops out of the view.
  *
  * Scale shape: one aggregation over the DELTA (the day's changes,
  * not the table) plus one outer join on the group key against the
  * old view — at 100 TB the fact table is never rescanned.
  */
object IncrementalAgg {

  /** `mv` must carry (`groupCol`, "n", "qsum"); `feed` must carry
    * (`groupCol`, `valueCol`, "_change_type"). Returns the updated
    * view with the same three columns. */
  def applyCountSumDelta(
      mv: DataFrame,
      feed: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val positive = col("_change_type").isin("insert", "update_postimage")
    val signed = feed.select(col(groupCol),
      when(positive, lit(1L)).otherwise(lit(-1L)).as("dn"),
      when(positive, col(valueCol)).otherwise(-col(valueCol)).as("dq"))
    val delta = signed.groupBy(groupCol)
      .agg(sum("dn").as("dn"), sum("dq").as("dq"))
    mv.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("qsum"), lit(0L)) + coalesce(col("dq"), lit(0L))).as("qsum"))
      .where(col("n") > 0)
  }
}
