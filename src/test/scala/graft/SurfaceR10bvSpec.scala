package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bv

class SurfaceR10bvSpec extends SparkSpec {

  test("every R10bv query runs at sf0.001") {
    SurfaceR10bv.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  private def daily: Array[(Long, Long)] =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("m157: coefficients match a driver-side Cramer solve") {
    val ds = daily
    val n = ds.length.toDouble
    val st = ds.map(_._1.toDouble).sum
    val st2 = ds.map(p => math.pow(p._1, 2)).sum
    val st3 = ds.map(p => math.pow(p._1, 3)).sum
    val st4 = ds.map(p => math.pow(p._1, 4)).sum
    val sy = ds.map(_._2.toDouble).sum
    val sty = ds.map(p => p._1.toDouble * p._2).sum
    val st2y = ds.map(p => p._1.toDouble * p._1 * p._2).sum
    val syy = ds.map(p => p._2.toDouble * p._2).sum
    def det3(m: Array[Double]): Double =
      m(0) * (m(4) * m(8) - m(5) * m(7)) -
        m(1) * (m(3) * m(8) - m(5) * m(6)) +
        m(2) * (m(3) * m(7) - m(4) * m(6))
    val dd = det3(Array(n, st, st2, st, st2, st3, st2, st3, st4))
    val a = det3(Array(sy, st, st2, sty, st2, st3, st2y, st3, st4)) / dd
    val b = det3(Array(n, sy, st2, st, sty, st3, st2, st2y, st4)) / dd
    val c = det3(Array(n, st, sy, st, st2, sty, st2, st3, st2y)) / dd
    val sseQ = syy - a * sy - b * sty - c * st2y
    val row = SurfaceR10bv.m157QuadraticTrend(spark, sfDir).collect().head
    assert(row.getLong(0) == ds.length)
    assert(math.abs(row.getDouble(1) - a) < math.max(1e-2, math.abs(a) * 1e-3))
    assert(math.abs(row.getDouble(2) - b) < math.max(1e-3, math.abs(b) * 1e-2))
    assert(math.abs(row.getLong(3) - c * 1e7) < 100, s"c ${row.getLong(3)} vs ${c * 1e7}")
    assert(math.abs(row.getDouble(4) - sseQ) < math.abs(sseQ) * 1e-3 + 1.0)
    // quadratic can only fit better than the line
    assert(row.getDouble(4) <= row.getDouble(5) + 1e-6)
    assert(row.getDouble(6) >= -1e-9)
  }

  test("m158: counts and z match a driver-side replay") {
    val ds = daily
    val n1 = ds.filter(_._1 < 1277).map(_._2).sum
    val n2 = ds.filter(_._1 >= 1277).map(_._2).sum
    val d1 = ds.count(_._1 < 1277).toLong
    val d2 = ds.count(_._1 >= 1277).toLong
    val p = d1.toDouble / (d1 + d2)
    val z = (n1 - (n1 + n2) * p) / math.sqrt((n1 + n2) * p * (1 - p))
    val row = SurfaceR10bv.m158PoissonRateTest(spark, sfDir).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(row.getLong(2) == d1 && row.getLong(3) == d2)
    assert(math.abs(row.getDouble(6) - z) < 1e-2, s"z ${row.getDouble(6)} vs $z")
    assert(row.getDouble(7) >= 0.0 && row.getDouble(7) <= 1.0)
  }
}
