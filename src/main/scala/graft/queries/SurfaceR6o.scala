package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-6 wave 12: time-based RANGE window frames — the rolling
  * interval aggregate that needs no bucket grid (w4/w5 cover row- and
  * value-based frames; t1/t2 cover bucketed time windows; this is the
  * continuous-time sliding form).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract row
  * SURVEY.md §2.6 (windows).
  */
object SurfaceR6o extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** W10: per-user rolling 6-hour sum/count over the event stream, as a
    * RANGE frame on integer epoch seconds — every event sees exactly the
    * trailing 6 h window ending at itself, with no bucket-boundary
    * artifacts. One shuffle by user + one ordered scan per partition;
    * the integer-second key (unix_micros div, truncation semantics
    * shared with the oracle's floor division) keeps the frame edge
    * bit-exact across engines. At 100 TB the partition key bounds state:
    * the scan holds only the 6 h tail per user, the same invariant a
    * watermarked stream would keep.
    */
  val w10TimeRangeFrame: Q = (s, d) => {
    val e = events(s, d)
      .withColumn("sec", expr("unix_micros(ts) div 1000000"))
    val w = Window.partitionBy("user_id").orderBy("sec")
      .rangeBetween(-21600L, 0L)
    e.select(col("event_id"), col("user_id"), col("sec"),
        r4(sum("value").over(w)).as("sum_6h"),
        count(lit(1)).over(w).as("n_6h"))
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "w10_time_range_frame" -> w10TimeRangeFrame)

  val oracleSql: Map[String, String] = Map(
    "w10_time_range_frame" ->
      """WITH e AS (
        |  SELECT event_id, user_id, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec
        |  FROM events)
        |SELECT event_id, user_id, CAST(sec AS BIGINT) AS sec,
        |  round(sum(value) OVER w, 4) AS sum_6h,
        |  count(*) OVER w AS n_6h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY sec
        |             RANGE BETWEEN 21600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)
}
