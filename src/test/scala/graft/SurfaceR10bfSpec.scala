package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bf

class SurfaceR10bfSpec extends SparkSpec {

  test("every R10bf query runs at sf0.001") {
    SurfaceR10bf.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  private def dailySeries: Array[(Long, Long)] =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  test("m141: xi matches a driver-side replay and sits in [-0.5, 1]") {
    val ds = dailySeries.sortBy(_._1)
    val ys = ds.map(_._2)
    val n = ys.length
    val r = ys.map(yi => ys.count(_ <= yi).toLong)
    val l = ys.map(yi => ys.count(_ >= yi).toLong)
    val sumD = (1 until n).map(i => math.abs(r(i) - r(i - 1))).sum
    val den = 2L * l.map(li => li * (n - li)).sum
    val xi = 1.0 - n.toDouble * sumD / den
    val row = SurfaceR10bf.m141ChatterjeeXi(spark, sfDir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == sumD, s"sum_d ${row.getLong(1)} vs $sumD")
    assert(row.getLong(2) == den)
    assert(math.abs(row.getDouble(3) - xi) < 1e-3)
    assert(row.getDouble(3) >= -0.5 && row.getDouble(3) <= 1.0)
  }

  test("m142: PH statistic and alarms match an exact driver-side replay") {
    val ds = dailySeries.sortBy(_._1)
    val n = ds.length.toLong
    val s1 = ds.map(_._2).sum
    var cum = 0L; var runmin = Long.MaxValue; var phMax = 0L
    var firstAlarm = -1L; var nAlarm = 0L
    ds.foreach { case (t, y) =>
      cum += n * y - s1 - n
      runmin = math.min(runmin, cum)
      val ph = cum - runmin
      phMax = math.max(phMax, ph)
      if (ph > n * 50) {
        if (firstAlarm < 0) firstAlarm = t
        nAlarm += 1
      }
    }
    val row = SurfaceR10bf.m142PageHinkley(spark, sfDir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == s1)
    assert(row.getLong(2) == phMax, s"ph ${row.getLong(2)} vs $phMax")
    assert(math.abs(row.getDouble(3) - phMax.toDouble / n) < 1e-3)
    assert(row.getLong(4) == firstAlarm, s"alarm ${row.getLong(4)} vs $firstAlarm")
    assert(row.getLong(5) == nAlarm)
  }
}
