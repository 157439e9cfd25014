package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10be

class SurfaceR10beSpec extends SparkSpec {

  test("every R10be query runs at sf0.001") {
    SurfaceR10be.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  private def ordersDf = spark.read.parquet(s"$sfDir/orders.parquet")

  test("x20: GROUP BY ALL equals the explicit-keys API twin") {
    val got = SurfaceR10be.x20GroupByAll(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val want = ordersDf
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
  }

  test("x21: LATERAL decorrelates to the plain per-priority aggregate") {
    val got = SurfaceR10be.x21LateralJoin(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = ordersDf
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        max(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")).as("mc"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
    // Decorrelation proof: no per-row re-execution shape in the plan.
    val plan = SurfaceR10be.x21LateralJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "LATERAL planned a cartesian")
  }

  test("x22: PIVOT cells equal the CASE-WHEN twin, nulls normalized") {
    val got = SurfaceR10be.x22SqlPivot(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = ordersDf
      .groupBy("o_orderpriority")
      .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("f"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("o"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("p"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    assert(got.size == 5)
  }
}
