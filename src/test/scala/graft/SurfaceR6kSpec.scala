package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR6k

class SurfaceR6kSpec extends SparkSpec {

  test("A27: bitmap pipeline equals count_distinct, and the level-1 state is mergeable") {
    val bm = SurfaceR6k.a27BitmapDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority").agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bm == exact)
    // Mergeability: per-orderstatus bitmaps OR-merged across status give
    // the global distinct without rescanning rows.
    val merged = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"),
        expr("bitmap_bucket_number(o_custkey)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").as("bm"))
      .groupBy("bucket")
      .agg(expr("bitmap_or_agg(bm)").as("obm"))
      .agg(sum(expr("bitmap_count(obm)")))
      .collect()(0).getLong(0)
    val globalExact = Tables.orders(spark, sfDir)
      .agg(countDistinct("o_custkey")).collect()(0).getLong(0)
    assert(merged == globalExact)
  }

  test("LP15: exactly one active SCD2 version per customer with pre-PIT history") {
    val out = SurfaceR6k.lp15Scd2(spark, sfDir)
    val perCust = out.groupBy("o_custkey").count().collect()
    assert(perCust.nonEmpty)
    assert(perCust.forall(_.getLong(1) == 1L), "PIT lookup must be unique per entity")
    val expected = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") <= lit("1998-06-01").cast("date"))
      .select("o_custkey").distinct().count()
    assert(out.count() == expected)
  }

  test("x11 precondition: event_type domain stays within k=5") {
    // x11's hash-comparability argument (SurfaceR6k.scala) is
    // fixture-contingent: with > k distinct values and a count tie at
    // the k-boundary the sketch's pick and the oracle's LIMIT cut could
    // legitimately diverge. Fixture drift must fail HERE, loudly, not
    // flake the oracle.
    val distinct = Tables.events(spark, sfDir)
      .select("event_type").distinct().count()
    assert(distinct <= 5, s"event_type domain grew to $distinct (> k=5): " +
      "x11's exactness precondition no longer holds")
  }

  test("X11: approx_top_k is exact below maxItemsTracked") {
    val sk = SurfaceR6k.x11ApproxTopK(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("event_type")).limit(5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sk == exact)
  }

  test("M26: each emitted MaxAbs-scaled dimension attains magnitude 1") {
    val rows = SurfaceR6k.m26Maxabs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    (1 to 3).foreach { i =>
      val mx = rows.map(r => math.abs(r.getDouble(i))).max
      assert(math.abs(mx - 1.0) < 1e-3, s"dim $i max |scaled| = $mx")
      assert(rows.forall(r => math.abs(r.getDouble(i)) <= 1.0 + 1e-9))
    }
  }
}
