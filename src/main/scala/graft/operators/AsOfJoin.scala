package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (J8) — Spark has no built-in; DuckDB's `ASOF JOIN`
  * is the oracle semantics: for each left row, attach the single most
  * recent right row whose time is <= the left row's time, per key.
  *
  * Implementation is the union+window trick:
  *   1. tag left and right rows, align schemas with unionByName
  *      (allowMissingColumns fills the other side's columns with null);
  *   2. one shuffle: window partitioned by key, ordered by
  *      (time, isLeft) — right rows sort BEFORE left rows at equal
  *      timestamps so equality matches, like ASOF's `>=`;
  *   3. `last(payload, ignoreNulls)` over an unbounded-preceding frame
  *      carries the latest right payload forward; payload is a single
  *      struct so all right columns come from the SAME matched row.
  *
  * Scale: exactly one shuffle on the join keys, no broadcast, no
  * driver-side state — the same plan a dedicated merge-join would need.
  * Heavily skewed keys serialize within a partition (windows cannot be
  * split); for those, pre-bucket by coarse time range first.
  */
object AsOfJoin {

  /** @param keys      equi-join key columns present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param prefix    prefix for right-side payload columns in the output
    * @return left rows + prefixed right payload columns (null when no
    *         right row precedes the left row)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      prefix: String = "asof_"): DataFrame =
    joinDirected(left, right, keys, leftTime, rightTime, prefix,
      timeAscending = true)

  /** Forward as-of join: for each left row, attach the single EARLIEST
    * right row whose time is >= the left row's time, per key (DuckDB
    * `ASOF ... ON l.t <= r.t`) — "next reading at or after this event".
    * Same union+window machinery scanning time DESCENDING, so the last
    * right payload seen at a left row is the smallest right time at or
    * after it. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      prefix: String = "asof_"): DataFrame =
    joinDirected(left, right, keys, leftTime, rightTime, prefix,
      timeAscending = false)

  private def joinDirected(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      prefix: String,
      timeAscending: Boolean): DataFrame = {
    val payloadCols = right.columns.filterNot(keys.contains).toSeq
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_is_left", lit(1))
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_is_left", lit(0))
      .withColumn("_rpayload", struct(payloadCols.map(col): _*))
      .select((keys ++ Seq("_t", "_is_left", "_rpayload")).map(col): _*)

    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal timestamps in either
    // direction, so the at-or-{before,after} equality case matches
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(if (timeAscending) col("_t").asc else col("_t").desc,
        col("_is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("_match", last(col("_rpayload"), ignoreNulls = true).over(w))
      .where(col("_is_left") === 1)

    val out = payloadCols.foldLeft(matched) { (df, c) =>
      df.withColumn(prefix + c, col("_match").getField(c))
    }
    out.drop("_t", "_is_left", "_rpayload", "_match")
  }
}
