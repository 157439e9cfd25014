package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10da

class SurfaceR10daSpec extends SparkSpec {

  test("every R10da query runs at sf0.001") {
    SurfaceR10da.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m183: IRLS replay matches; huber sits between median and mean pull") {
    val groups = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT)").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).sorted }
    def med(xs: Seq[Long]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2).toDouble
      else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
    }
    val out = SurfaceR10da.m183HuberLocation(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    groups.foreach { case (g, xs) =>
      val m0 = med(xs)
      def medD(ds: Seq[Double]): Double = {
        val n = ds.length
        if (n % 2 == 1) ds(n / 2) else (ds(n / 2 - 1) + ds(n / 2)) / 2.0
      }
      val madv = medD(xs.map(v => math.abs(v - m0)).sorted)
      val k = 1.345 * 1.4826 * madv
      var mu = m0
      for (_ <- 1 to 3) {
        val ws = xs.map { v =>
          val r0 = math.abs(v - mu)
          val w = if (r0 < 0.25) 1e6
            else math.min(1.0, k / r0) * 1e6
          math.floor(w + 0.5)
        }
        mu = ws.zip(xs).map { case (w, v) => w * v }.sum / ws.sum
      }
      val (meanX, medianX, huber) = out(g)
      assert(math.abs(medianX - m0) < 1e-6, s"$g median $medianX vs $m0")
      assert(math.abs(huber - mu) < 1.0, s"$g huber $huber vs replay $mu")
      assert(math.abs(meanX - xs.sum.toDouble / xs.length) < 1e-3)
    }
  }

  test("lt64: R/S averages are positive and H lands in (0,1)") {
    val out = SurfaceR10da.lt64Hurst(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      if (!r.isNullAt(4)) {
        val h = r.getDouble(4)
        assert(h > 0.0 && h < 1.0, s"${r.getString(0)} H=$h outside (0,1)")
        assert(r.getDouble(1) > 0 && r.getDouble(3) > 0)
        // R/S grows with window length for any real series
        assert(r.getDouble(3) > r.getDouble(1),
          s"${r.getString(0)} rs32 ${r.getDouble(3)} <= rs8 ${r.getDouble(1)}")
      }
    }
  }
}
