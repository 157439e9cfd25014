package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bs

class SurfaceR10bsSpec extends SparkSpec {

  test("every R10bs query runs at sf0.001") {
    SurfaceR10bs.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  private def daily: Array[(Long, Long, Long)] =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"),
        expr("CAST(floor(o_totalprice / 1000) AS BIGINT)").as("kd"))
      .groupBy("t").agg(count(lit(1)).as("y"), sum("kd").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)

  test("m155: partial r matches a driver-side replay") {
    val ds = daily
    val n = ds.length.toDouble
    def corr(u: Array[Double], v: Array[Double]): Double = {
      val su = u.sum; val sv = v.sum
      val suv = u.zip(v).map(p => p._1 * p._2).sum
      val suu = u.map(x => x * x).sum; val svv = v.map(x => x * x).sum
      (n * suv - su * sv) / (math.sqrt(n * suu - su * su) * math.sqrt(n * svv - sv * sv))
    }
    val t = ds.map(_._1.toDouble); val y = ds.map(_._2.toDouble); val z = ds.map(_._3.toDouble)
    val ryz = corr(y, z); val ryt = corr(y, t); val rzt = corr(z, t)
    val part = (ryz - ryt * rzt) / math.sqrt((1 - ryt * ryt) * (1 - rzt * rzt))
    val row = SurfaceR10bs.m155PartialCorrelation(spark, sfDir).collect().head
    assert(row.getLong(0) == ds.length)
    assert(math.abs(row.getDouble(1) - ryz) < 1e-3)
    assert(math.abs(row.getDouble(2) - ryt) < 1e-3)
    assert(math.abs(row.getDouble(3) - rzt) < 1e-3)
    assert(math.abs(row.getDouble(4) - part) < 1e-3, s"partial ${row.getDouble(4)} vs $part")
  }

  test("lt49: MI matches a driver-side replay and is nonnegative") {
    val ds = daily
    val n = ds.length
    val s1 = ds.map(_._2).sum.toDouble
    val s2 = ds.map(p => p._2.toDouble * p._2).sum
    val mu = s1 / n
    val sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
    def bin(y: Long): Int = {
      val zz = (y - mu) / sd
      if (zz < -0.6745) 0 else if (zz < 0) 1 else if (zz < 0.6745) 2 else 3
    }
    val bins = ds.map(p => bin(p._2))
    val pairs = bins.zip(bins.drop(1)).map { case (prev, cur) => (cur, prev) }
    val cells = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nn = pairs.length.toDouble
    val rm = cells.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val cm = cells.groupBy(_._1._2).map { case (k, v) => k -> v.values.sum }
    val mi = cells.map { case ((b, bp), c) =>
      (c / nn) * math.log(c * nn / (rm(b).toDouble * cm(bp)))
    }.sum
    val row = SurfaceR10bs.lt49LaggedMi(spark, sfDir).collect().head
    assert(row.getLong(0) == pairs.length)
    assert(row.getLong(1) == cells.size)
    assert(math.abs(row.getDouble(2) - mi) < 1e-3, s"mi ${row.getDouble(2)} vs $mi")
    assert(row.getDouble(2) >= -1e-9, "MI must be nonnegative")
    assert(math.abs(row.getDouble(3) - mi / math.log(4)) < 1e-3)
  }
}
