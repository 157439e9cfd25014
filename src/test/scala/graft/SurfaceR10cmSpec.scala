package graft

import graft.queries.SurfaceR10cm

class SurfaceR10cmSpec extends SparkSpec {

  private def r4d(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
  private def q4(x: Double): Long = math.floor(x * 1e4 + 0.5).toLong

  test("every R10cm query runs at sf0.001") {
    SurfaceR10cm.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m172: Weibull fit matches a quantized median-rank replay") {
    import org.apache.spark.sql.functions._
    val ages = Tables.lineitem(spark, sfDir).groupBy("l_orderkey")
      .agg(expr("max(unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000)").as("ls"))
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .select(expr("greatest(ls - od, 0L) + 1").as("t"))
      .collect().map(_.getLong(0))
    val n = ages.length.toLong
    val byT = ages.groupBy(identity).map { case (t, v) => t -> v.length.toLong }
      .toSeq.sortBy(_._1)
    var cum = 0L
    val pts = byT.map { case (t, c) =>
      cum += c
      val f = (cum - 0.3) / (n + 0.4)
      (q4(math.log(t.toDouble)), q4(math.log(-math.log(1.0 - f))))
    }
    val k = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (k * sxy.toDouble - sx.toDouble * sy) /
      (k * sxx.toDouble - sx.toDouble * sx)
    val intercept = (sy.toDouble - slope * sx) / k / 1e4
    val r = SurfaceR10cm.m172WeibullFit(spark, sfDir).collect().head
    assert(r.getLong(0) == k)
    assert(math.abs(r.getDouble(1) - r4d(slope)) < 1e-12, "shape")
    assert(math.abs(r.getDouble(2) -
      r4d(math.exp(-intercept / slope))) < 1e-12, "scale")
    // fulfilment ages rise steeply then saturate: a meaningful fit
    assert(r.getDouble(1) > 0.0 && r.getDouble(3) > 0.5, "shape/r2 sanity")
  }

  test("m173: LOOCV never beats in-sample at lambda=0; penalty raises in-sample error") {
    val rows = SurfaceR10cm.m173RidgePress(spark, sfDir).collect()
      .sortBy(_.getDouble(0))
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getDouble(1) >= r.getDouble(2) - 1e-9,
        s"lambda ${r.getDouble(0)}: loocv ${r.getDouble(1)} < in ${r.getDouble(2)}")
    }
    // In-sample RMSE is monotonically non-decreasing in the penalty.
    val ins = rows.map(_.getDouble(2))
    assert(ins(0) <= ins(1) + 1e-9 && ins(1) <= ins(2) + 1e-9, ins.mkString(","))
  }
}
