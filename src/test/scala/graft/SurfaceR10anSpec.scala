package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10an

class SurfaceR10anSpec extends SparkSpec {

  test("every R10an query runs at sf0.001") {
    SurfaceR10an.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt36: Q matches a driver-side recompute of the portmanteau sum") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    SurfaceR10an.lt36LjungBox(spark, sfDir).collect().foreach { r =>
      val series = daily(r.getString(0)).sortBy(_._2).map(_._3.toDouble)
      val n = series.length.toDouble
      val mean = series.sum / n
      val dev = series.map(_ - mean)
      val den = dev.map(x => x * x).sum
      def rho(k: Int) =
        dev.drop(k).zip(dev.dropRight(k)).map { case (a, b) => a * b }.sum / den
      val q = n * (n + 2) * (1 to 5).map(k => rho(k) * rho(k) / (n - k)).sum
      assert(r.getLong(1) == series.length, "n_days mismatch")
      assert(math.abs(r.getDouble(2) - rho(1)) < 1e-3,
        s"rho1 ${r.getDouble(2)} vs ${rho(1)} for ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - q) < math.abs(q) * 1e-3 + 1e-3,
        s"Q ${r.getDouble(3)} vs $q for ${r.getString(0)}")
    }
  }

  test("m121: DW is in (0,4) and matches the naive residual recompute") {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble))
      .sortBy(_._1)
    val n = daily.length.toDouble
    val st = daily.map(_._1).sum; val sy = daily.map(_._2).sum
    val stt = daily.map(p => p._1 * p._1).sum
    val sty = daily.map(p => p._1 * p._2).sum
    val b = (n * sty - st * sy) / (n * stt - st * st)
    val a = (sy - b * st) / n
    val e = daily.map { case (t, y) => y - a - b * t }
    val dw = e.sliding(2).map(p => (p(1) - p(0)) * (p(1) - p(0))).sum /
      e.map(x => x * x).sum
    val r = SurfaceR10an.m121DurbinWatson(spark, sfDir).collect().head
    assert(r.getLong(0) == daily.length)
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 4.0, s"DW ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(2) - dw) < 1e-2, s"DW ${r.getDouble(2)} vs $dw")
    assert(math.abs(r.getDouble(1) - b) < 1e-3, s"slope ${r.getDouble(1)} vs $b")
  }
}
