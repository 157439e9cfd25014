package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR11j

class SurfaceR11jSpec extends SparkSpec {

  test("every R11j query runs at sf0.001") {
    SurfaceR11j.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt77: matches an independent full-precision Scala Theta replay") {
    import spark.implicits._
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(avg("value").as("v"))
      .orderBy("event_type", "day")
      .select(col("event_type"), col("v"))
      .as[(String, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(t => math.floor(t._2 * 1e6 + 0.5) / 1e6).toVector)
      .toMap
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val got = SurfaceR11j.queries("lt77_theta")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.nonEmpty)
    got.foreach { case (et, row) =>
      val v = daily(et); val n = v.length
      val sx = (1 to n).sum.toDouble
      val sxx = (1 to n).map(j => j * j).sum.toDouble
      val sy = v.sum
      val sxy = v.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val a = sy / n - b * (sx / n)
      var l = 2 * v(0) - (a + b * 1)
      for (j <- 2 to n) l = 0.5 * (2 * v(j - 1) - (a + b * j)) + 0.5 * l
      def f(h: Int) = (l + (a + b * (n + h))) / 2.0
      assert(math.abs(row.getAs[Double]("slope") - r4(b)) < 1e-3, s"$et slope")
      assert(math.abs(row.getAs[Double]("ses_level") - r4(l)) < 1e-3, s"$et ses")
      assert(math.abs(row.getAs[Double]("f1") - r4(f(1))) < 1e-3, s"$et f1")
      assert(math.abs(row.getAs[Double]("f3") - r4(f(3))) < 1e-3, s"$et f3")
    }
  }

  test("lt77: with zero curvature the forecast collapses to the trend line") {
    import spark.implicits._
    // a perfectly linear series: theta2 == the series itself, SES of a
    // line lags it but the COMBINATION must still track the trend to
    // first order — check the method's fixed point: slope recovered
    val n = 20
    val syn = (1 to n).map(j => ("lin", j, 10.0 + 2.5 * j))
    val df = syn.toDF("event_type", "j", "v")
    val sx = (1 to n).sum.toDouble
    val sxx = (1 to n).map(j => j * j).sum.toDouble
    val sy = syn.map(_._3).sum
    val sxy = syn.map { case (_, j, x) => j * x }.sum
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(b - 2.5) < 1e-9, s"OLS slope $b != 2.5 on exact line")
  }
}
