package graft.queries

import org.apache.spark.ml.feature.MaxAbsScaler
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-6 wave 8: bitmap-based EXACT distinct counting (the mergeable
  * alternative to count(distinct) that re-aggregates without rescan),
  * grouping()/grouping_id() disambiguation, SCD2 point-in-time
  * reconstruction, MaxAbsScaler checked against exact SQL, and the
  * approx_top_k sketch.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.4 (aggregates), §2.9 (pipeline ops), §2.11 (MLlib).
  */
object SurfaceR6k extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- A27: bitmap exact-distinct ----

  /** A27: exact distinct customers per priority via the bitmap aggregate
    * family — the 100 TB answer to count(distinct)'s no-reaggregation
    * problem. Level 1 builds one RoaringBitmap-style buffer per
    * (group, 32k-bucket) from bit positions; level 2 counts bits and
    * sums. Unlike count(distinct), the level-1 bitmaps are MERGEABLE
    * state: daily bitmaps OR together into monthly distincts with no
    * rescan (a16's HLL gives the approximate version; this is exact).
    * The oracle is plain count(DISTINCT), so the whole bitmap pipeline
    * is hash-checked.
    */
  val a27BitmapDistinct: Q = (s, d) =>
    orders(s, d)
      .groupBy(col("o_orderpriority"),
        expr("bitmap_bucket_number(o_custkey)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").as("bm"))
      .groupBy("o_orderpriority")
      .agg(sum(expr("bitmap_count(bm)")).as("n_distinct"))
      .orderBy("o_orderpriority")

  // ---- A28: grouping() / grouping_id ----

  /** A28: CUBE with grouping() flags — distinguishing "NULL because the
    * data is NULL" from "NULL because this row is a subtotal", which no
    * amount of inspecting the key columns can do. The composed id uses
    * explicit g1*2+g2 arithmetic so both engines share the semantics
    * regardless of their native grouping_id bit orders. */
  val a28GroupingFuncs: Q = (s, d) =>
    lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(r4(sum("l_quantity")).as("sum_qty"),
        grouping(col("l_returnflag")).cast("int").as("g1"),
        grouping(col("l_linestatus")).cast("int").as("g2"))
      .select(col("l_returnflag"), col("l_linestatus"), col("g1"), col("g2"),
        (col("g1") * 2 + col("g2")).as("gid"), col("sum_qty"))
      .orderBy("gid", "l_returnflag", "l_linestatus")

  // ---- LP15: SCD2 versioning + point-in-time lookup ----

  /** LP15: slowly-changing-dimension type 2 — each customer's order
    * stream becomes versioned rows [valid_from, valid_to) via one
    * lead() window, then a point-in-time predicate reconstructs the
    * state as of 1998-06-01. This is the reproducibility primitive for
    * training pipelines ("join features as they were when the label was
    * created"): one shuffle by entity to build versions; the PIT lookup
    * itself is the j8 as-of shape when the right side is an event
    * stream. */
  val lp15Scd2: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    orders(s, d)
      .withColumn("valid_to",
        lead(col("o_orderdate"), 1).over(w))
      .where(col("o_orderdate") <= lit("1998-06-01").cast("date") &&
        (col("valid_to").isNull ||
          col("valid_to") > lit("1998-06-01").cast("date")))
      .select(col("o_custkey"), col("o_orderkey").as("active_order"),
        col("o_orderdate").as("valid_from"), col("valid_to"))
      .orderBy("o_custkey")
  }

  // ---- M26: MaxAbsScaler ----

  /** M26: ml.feature.MaxAbsScaler hash-compared against the exact
    * per-dimension x/max|x| arithmetic in SQL (dims are independent, so
    * the oracle checks the emitted components against their own column
    * maxima). The fit is one max-abs pass — sketch-sized merge state per
    * dimension, no row buffering — and the transform is row-local. */
  val m26Maxabs: Q = (s, d) => {
    val df = embeddings(s, d).withColumn("v", array_to_vector(col("embedding")))
    val model = new MaxAbsScaler().setInputCol("v").setOutputCol("sv").fit(df)
    model.transform(df)
      .withColumn("arr", vector_to_array(col("sv")))
      .select(col("vec_id"),
        r4(col("arr").getItem(0)).as("c0"),
        r4(col("arr").getItem(1)).as("c1"),
        r4(col("arr").getItem(2)).as("c2"))
      .orderBy("vec_id")
  }

  // ---- X11: approx_top_k ----

  /** X11: the approx_top_k frequency sketch. On a domain smaller than
    * maxItemsTracked the sketch is EXACT, so the fixture result is
    * hash-comparable against plain count ordering — while the operator
    * itself remains the sketch a 100 TB pipeline would run (mergeable
    * state, no full groupBy materialization). Output re-sorted
    * deterministically; count ties broken by item.
    *
    * PRECONDITION (fixture-contingent exactness): the event_type domain
    * must have ≤ k = 5 distinct values. With > k values and a count tie
    * exactly at the k-boundary, the sketch's pick and the oracle's
    * LIMIT-style cut could legitimately select different items. A spec
    * (SurfaceR6kSpec "x11 precondition") asserts the fixture domain
    * stays ≤ k so drift fails loudly instead of flaking the oracle. */
  val x11ApproxTopK: Q = (s, d) =>
    events(s, d)
      .agg(expr("approx_top_k(event_type, 5)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("event_type"), col("e.count").as("n"))
      .orderBy(col("n").desc, col("event_type"))

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "a27_bitmap_distinct" -> a27BitmapDistinct,
    "a28_grouping_funcs" -> a28GroupingFuncs,
    "lp15_scd2" -> lp15Scd2,
    "m26_maxabs" -> m26Maxabs,
    "x11_approx_top_k" -> x11ApproxTopK)

  val oracleSql: Map[String, String] = Map(
    "a27_bitmap_distinct" ->
      """SELECT o_orderpriority,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "a28_grouping_funcs" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g1,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g2,
        |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INT) AS gid,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "lp15_scd2" ->
      """WITH v AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    lead(o_orderdate) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS valid_to
        |  FROM orders)
        |SELECT o_custkey, o_orderkey AS active_order,
        |  o_orderdate AS valid_from, valid_to
        |FROM v
        |WHERE o_orderdate <= DATE '1998-06-01'
        |  AND (valid_to IS NULL OR valid_to > DATE '1998-06-01')
        |ORDER BY o_custkey""".stripMargin,
    "m26_maxabs" ->
      """WITH m AS (
        |  SELECT max(abs(CAST(embedding[1] AS DOUBLE))) AS m1,
        |         max(abs(CAST(embedding[2] AS DOUBLE))) AS m2,
        |         max(abs(CAST(embedding[3] AS DOUBLE))) AS m3
        |  FROM embeddings)
        |SELECT vec_id,
        |  round(CAST(embedding[1] AS DOUBLE) / m1, 4) AS c0,
        |  round(CAST(embedding[2] AS DOUBLE) / m2, 4) AS c1,
        |  round(CAST(embedding[3] AS DOUBLE) / m3, 4) AS c2
        |FROM embeddings CROSS JOIN m ORDER BY vec_id""".stripMargin,
    "x11_approx_top_k" ->
      """SELECT event_type, count(*) AS n
        |FROM events GROUP BY event_type
        |ORDER BY n DESC, event_type LIMIT 5""".stripMargin)
}
