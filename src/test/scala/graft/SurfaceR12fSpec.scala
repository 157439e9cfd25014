package graft

import org.apache.spark.sql.functions._

/** Laws for round-12 batch 6: aggregate pushdown and Croston. */
class SurfaceR12fSpec extends SparkSpec {

  test("s30: footer aggregates equal data-path aggregates and restore configs") {
    val before = spark.conf.get("spark.sql.sources.useV1SourceList")
    val out = queries.SurfaceR12f.s30AggPushdown(spark, sfDir).collect()(0)
    assert(spark.conf.get("spark.sql.sources.useV1SourceList") === before,
      "s30 must restore the v1-source list")
    val ref = Tables.lineitem(spark, sfDir)
      .agg(count(lit(1)), min("l_orderkey"), max("l_orderkey"),
        min("l_quantity"), max("l_quantity"),
        min("l_extendedprice"), max("l_extendedprice")).collect()(0)
    assert(out.toSeq === ref.toSeq,
      "footer statistics disagree with the data path")
  }

  test("lt83: demand rate is positive and bounded by max daily size") {
    val out = queries.SurfaceR12f.lt83Croston(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.where(col("size_level") <= 0 || col("interval_level") <= 0 ||
      col("demand_rate") <= 0).count() === 0)
    // smoothed size is a convex combination of observed sizes, so it
    // cannot exceed the part's max daily demand
    val maxq = Tables.lineitem(spark, sfDir)
      .where(col("l_partkey") % 7 === 0)
      .groupBy(col("l_partkey"), col("l_shipdate"))
      .agg(sum("l_quantity").cast("long").as("q"))
      .groupBy("l_partkey").agg(max("q").as("maxq"))
    assert(out.join(maxq, "l_partkey")
      .where(col("size_level") > col("maxq")).count() === 0)
    out.unpersist()
  }

  test("lt83: constant demand at fixed cadence converges to size/gap") {
    import spark.implicits._
    // size 10 every 5 days: z -> 10, v -> 5 exactly (convex combos of a
    // constant), forecast 2.0 — replay the fold on a hand series
    val sv = (1 to 10).map(k => (k.toLong, 10L, if (k == 1) 0L else 5L))
    val df = sv.toDF("k", "q", "gap")
      .agg(sort_array(collect_list(struct(col("k"), col("q"), col("gap"))))
        .as("sv"))
      .selectExpr("""aggregate(sv,
          named_struct('i', CAST(0 AS BIGINT),
            'z', CAST(0.0 AS DOUBLE), 'v', CAST(0.0 AS DOUBLE)),
          (acc, x) -> named_struct('i', acc.i + 1,
            'z', CASE WHEN acc.i = 0 THEN CAST(x.q AS DOUBLE)
                      ELSE 0.3 * x.q + 0.7 * acc.z END,
            'v', CASE WHEN acc.i = 0 THEN CAST(0 AS DOUBLE)
                      WHEN acc.i = 1 THEN CAST(x.gap AS DOUBLE)
                      ELSE 0.3 * x.gap + 0.7 * acc.v END)) AS st""")
      .selectExpr("st.z AS z", "st.v AS v").collect()(0)
    assert(math.abs(df.getDouble(0) - 10.0) < 1e-9)
    assert(math.abs(df.getDouble(1) - 5.0) < 1e-9)
  }
}
