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

  test("m142: moments match a driver-side replay; p = exp(-jb/2)") {
    val ys = dailySeries.map(_._2.toDouble)
    val n = ys.length
    val mu = ys.sum / n
    val m2 = ys.map(y => (y - mu) * (y - mu)).sum / n
    val m3 = ys.map(y => math.pow(y - mu, 3)).sum / n
    val m4 = ys.map(y => math.pow(y - mu, 4)).sum / n
    val sk = m3 / (m2 * math.sqrt(m2))
    val ku = m4 / (m2 * m2)
    val jb = n / 6.0 * (sk * sk + (ku - 3) * (ku - 3) / 4)
    val row = SurfaceR10bf.m142JarqueBera(spark, sfDir).collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - sk) < 1e-3, s"skew ${row.getDouble(1)} vs $sk")
    assert(math.abs(row.getDouble(2) - ku) < 1e-3, s"kurt ${row.getDouble(2)} vs $ku")
    assert(math.abs(row.getDouble(3) - jb) < 2e-3)
    assert(math.abs(row.getDouble(4) - math.exp(-jb / 2)) < 1e-3)
  }
}
