package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ak

class SurfaceR10akSpec extends SparkSpec {

  test("every R10ak query runs at sf0.001") {
    SurfaceR10ak.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("w16: drawdown matches a driver-side scan of the daily series") {
    val rows = SurfaceR10ak.w16MaxDrawdown(spark, sfDir).collect()
    val daily = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_shipdate").cast("date").as("day"))
      .agg(floor(sum(col("l_extendedprice")) * 100 + lit(0.5)).as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val series = daily(r.getString(0)).sortBy(_._2)
      var peak = Long.MinValue; var best = 0.0; var bestDay = ""
      series.foreach { case (_, day, c) =>
        peak = math.max(peak, c)
        val dd = 1.0 - c.toDouble / peak
        if (dd > best) { best = dd; bestDay = day }
      }
      assert(math.abs(r.getDouble(2) - best) < 1e-3,
        s"${r.getString(0)}: dd ${r.getDouble(2)} vs $best")
      assert(r.getDate(1).toString == bestDay,
        s"${r.getString(0)}: trough ${r.getDate(1)} vs $bestDay")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0)
    }
  }

  test("s26: both nested feeds are discovered — two copies per nation") {
    val rows = SurfaceR10ak.s26RecursiveLookup(spark, sfDir).collect()
    assert(rows.length == 25)
    rows.foreach(r => assert(r.getLong(3) == 2L, "a nested copy was missed"))
  }
}
