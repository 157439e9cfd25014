package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ax

class SurfaceR10axSpec extends SparkSpec {

  test("every R10ax query runs at sf0.001") {
    SurfaceR10ax.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m134: theta/corr match a driver-side recompute and reduction = corr^2") {
    val pc = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"),
        expr("CASE WHEN o_orderdate < DATE '1996-01-01' THEN CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT) ELSE 0 END").as("x"),
        expr("CASE WHEN o_orderdate >= DATE '1996-01-01' THEN CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT) ELSE 0 END").as("y"))
      .groupBy("o_custkey").agg(sum("x").as("x"), sum("y").as("y"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    val n = pc.length.toDouble
    val mx = pc.map(_._1).sum / n; val my = pc.map(_._2).sum / n
    val cov = pc.map(p => (p._1 - mx) * (p._2 - my)).sum
    val vx = pc.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val vy = pc.map(p => (p._2 - my) * (p._2 - my)).sum
    val r = SurfaceR10ax.m134Cuped(spark, sfDir).collect().head
    assert(r.getLong(0) == pc.length)
    assert(math.abs(r.getDouble(1) - cov / vx) < 1e-3, "theta")
    val corr = cov / math.sqrt(vx * vy)
    assert(math.abs(r.getDouble(2) - corr) < 1e-3, "corr")
    assert(math.abs(r.getDouble(3) - corr * corr) < 1e-3, "reduction != corr^2")
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
  }

  test("m135: p-value is valid and the observed stat sits inside the null spread check") {
    val r = SurfaceR10ax.m135SignflipTest(spark, sfDir).collect().head
    val p = r.getDouble(3)
    assert(p >= 1.0 / 33.0 - 1e-9 && p <= 1.0, s"p $p out of range")
    assert(r.getLong(2) >= 0 && r.getLong(2) <= 32)
    assert(math.abs(p - (1.0 + r.getLong(2)) / 33.0) < 1e-3)
    assert(r.getLong(0) > 0)
    // reproducibility of the md5 sign patterns
    val r2 = SurfaceR10ax.m135SignflipTest(spark, sfDir).collect().head
    assert(r.toSeq == r2.toSeq)
  }
}
