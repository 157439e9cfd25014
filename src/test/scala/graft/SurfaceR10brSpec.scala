package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10br

class SurfaceR10brSpec extends SparkSpec {

  test("every R10br query runs at sf0.001") {
    SurfaceR10br.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m154: T2 matches a driver-side replay") {
    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(
        (col("l_shipdate").cast("date") < lit("1995-07-01").cast("date")).as("e1"),
        expr("CAST(l_quantity AS BIGINT)").as("x"),
        expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) DIV 100").as("y"))
      .collect().map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2)))
    def stats(g: Array[(Boolean, Long, Long)]) = {
      val n = g.length.toDouble
      val sx = g.map(_._2).sum.toDouble; val sy = g.map(_._3).sum.toDouble
      val sxx = g.map(p => p._2.toDouble * p._2).sum
      val syy = g.map(p => p._3.toDouble * p._3).sum
      val sxy = g.map(p => p._2.toDouble * p._3).sum
      (n, sx / n, sy / n, sxx - sx * sx / n, syy - sy * sy / n, sxy - sx * sy / n)
    }
    val (n1, mx1, my1, axx1, ayy1, axy1) = stats(base.filter(_._1))
    val (n2, mx2, my2, axx2, ayy2, axy2) = stats(base.filterNot(_._1))
    val df = n1 + n2 - 2
    val (pxx, pyy, pxy) = ((axx1 + axx2) / df, (ayy1 + ayy2) / df, (axy1 + axy2) / df)
    val (dx, dy) = (mx1 - mx2, my1 - my2)
    val det = pxx * pyy - pxy * pxy
    val quad = (dx * (pyy * dx - pxy * dy) + dy * (pxx * dy - pxy * dx)) / det
    val t2 = n1 * n2 / (n1 + n2) * quad
    val f = (n1 + n2 - 3) / (2 * (n1 + n2 - 2)) * t2
    val row = SurfaceR10br.m154HotellingT2(spark, sfDir).collect().head
    assert(row.getLong(0) == n1.toLong && row.getLong(1) == n2.toLong)
    assert(math.abs(row.getDouble(2) - dx) < 1e-3)
    assert(math.abs(row.getDouble(3) - dy) < 1e-2)
    assert(math.abs(row.getDouble(4) - t2) < 1e-2, s"t2 ${row.getDouble(4)} vs $t2")
    assert(math.abs(row.getDouble(5) - f) < 1e-2)
    assert(row.getLong(6) == (if (f > 3.0) 1L else 0L))
  }

  test("w15: third-highest equals a sort-based replay") {
    val byGrp = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderpriority"), col("o_orderkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val got = SurfaceR10br.w15NthValue(spark, sfDir).collect()
    assert(got.length == byGrp.size)
    got.foreach { r =>
      val sorted = byGrp(r.getString(0)).sortBy(p => (-p._3, p._2))
      assert(r.getLong(1) == sorted.head._3)
      assert(r.getLong(2) == sorted(2)._3,
        s"third for ${r.getString(0)}: ${r.getLong(2)} vs ${sorted(2)._3}")
    }
  }
}
