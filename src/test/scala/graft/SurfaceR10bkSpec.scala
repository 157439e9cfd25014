package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bk

class SurfaceR10bkSpec extends SparkSpec {

  test("every R10bk query runs at sf0.001") {
    SurfaceR10bk.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  private def pairs: Array[(Long, Long)] =
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) DIV 100").as("x"),
        expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) DIV 100").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("m148: Deming slope/intercept match a driver-side replay") {
    val ps = pairs
    val n = ps.length.toDouble
    val sx = ps.map(_._1).sum.toDouble
    val sy = ps.map(_._2).sum.toDouble
    val sxx = ps.map(p => p._1.toDouble * p._1).sum
    val syy = ps.map(p => p._2.toDouble * p._2).sum
    val sxy = ps.map(p => p._1.toDouble * p._2).sum
    val dxx = sxx - sx * sx / n
    val dyy = syy - sy * sy / n
    val dxy = sxy - sx * sy / n
    val slope = (dyy - dxx + math.sqrt((dyy - dxx) * (dyy - dxx) + 4 * dxy * dxy)) / (2 * dxy)
    val icept = (sy - slope * sx) / n
    val row = SurfaceR10bk.m148Deming(spark, sfDir).collect().head
    assert(row.getLong(0) == ps.length)
    assert(math.abs(row.getDouble(1) - slope) < 1e-3, s"slope ${row.getDouble(1)} vs $slope")
    assert(math.abs(row.getDouble(2) - icept) < 1.0)
    assert(row.getDouble(3) > 0.5, "order value measures should correlate")
    // Deming slope lies beyond OLS slope (attenuation): |b_deming| >= |b_ols|
    val bOls = dxy / dxx
    assert(math.abs(slope) >= math.abs(bOls) - 1e-9)
  }

  test("m149: Bland-Altman bias/limits/outside-count match a replay") {
    val ds = pairs.map(p => p._1 - p._2)
    val n = ds.length.toDouble
    val mean = ds.sum / n
    val sd = math.sqrt(ds.map(d => (d - mean) * (d - mean)).sum / (n - 1))
    val lo = mean - 1.96 * sd
    val hi = mean + 1.96 * sd
    val outside = ds.count(d => d < lo || d > hi)
    val row = SurfaceR10bk.m149BlandAltman(spark, sfDir).collect().head
    assert(row.getLong(0) == ds.length)
    assert(math.abs(row.getDouble(1) - mean) < 1e-2)
    assert(math.abs(row.getDouble(2) - sd) < 1e-1)
    assert(math.abs(row.getDouble(3) - lo) < 1.0)
    assert(math.abs(row.getDouble(4) - hi) < 1.0)
    assert(row.getLong(5) == outside, s"outside ${row.getLong(5)} vs $outside")
  }
}
