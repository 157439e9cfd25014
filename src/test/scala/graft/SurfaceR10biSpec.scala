package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bi

class SurfaceR10biSpec extends SparkSpec {

  test("every R10bi query runs at sf0.001") {
    SurfaceR10bi.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  private def daily: Array[(Long, Long)] =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

  test("m145: BP matches a driver-side replay") {
    val ds = daily
    val n = ds.length.toDouble
    val st = ds.map(_._1).sum.toDouble
    val sy = ds.map(_._2).sum.toDouble
    val stt = ds.map(p => p._1 * p._1).sum.toDouble
    val sty = ds.map(p => p._1 * p._2).sum.toDouble
    val b = (n * sty - st * sy) / (n * stt - st * st)
    val a = (sy - b * st) / n
    val u = ds.map { case (t, y) =>
      val eq = math.floor((y - a - b * t) * 1e4 + 0.5)
      (t, eq * eq)
    }
    val su = u.map(_._2).sum
    val stu = u.map(p => p._1 * p._2).sum
    val suu = u.map(p => p._2 * p._2).sum
    val r2 = math.pow(n * stu - st * su, 2) /
      ((n * stt - st * st) * (n * suu - su * su))
    val bp = n * r2
    val row = SurfaceR10bi.m145BreuschPagan(spark, sfDir).collect().head
    assert(row.getLong(0) == ds.length)
    assert(math.abs(row.getDouble(1) - r2) < 1e-3, s"r2 ${row.getDouble(1)} vs $r2")
    assert(math.abs(row.getDouble(2) - bp) < 5e-2)
    assert(row.getDouble(3) >= 0.0 && row.getDouble(3) <= 1.0)
  }

  test("m146: Chow F matches a driver-side replay") {
    val ds = daily
    def fit(seg: Array[(Long, Long)]): (Double, Double) = {
      val n = seg.length.toDouble
      val st = seg.map(_._1).sum.toDouble
      val sy = seg.map(_._2).sum.toDouble
      val stt = seg.map(p => p._1 * p._1).sum.toDouble
      val sty = seg.map(p => p._1 * p._2).sum.toDouble
      val syy = seg.map(p => p._2 * p._2).sum.toDouble
      val sxx = stt - st * st / n
      val sxy = sty - st * sy / n
      val ssr = (syy - sy * sy / n) - sxy * sxy / sxx
      (sxy / sxx, ssr)
    }
    val (s1, ssr1) = fit(ds.filter(_._1 < 1277))
    val (s2, ssr2) = fit(ds.filter(_._1 >= 1277))
    val (_, ssrP) = fit(ds)
    val n = ds.length.toDouble
    val f = ((ssrP - ssr1 - ssr2) / 2.0) / ((ssr1 + ssr2) / (n - 4.0))
    val row = SurfaceR10bi.m146ChowTest(spark, sfDir).collect().head
    assert(row.getLong(0) + row.getLong(1) == ds.length)
    assert(math.abs(row.getDouble(2) - s1) < 1e-3)
    assert(math.abs(row.getDouble(3) - s2) < 1e-3)
    assert(math.abs(row.getDouble(4) - f) < 1e-2, s"F ${row.getDouble(4)} vs $f")
    assert(row.getLong(5) == (if (f > 3.0) 1L else 0L))
  }
}
