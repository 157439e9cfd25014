package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10dc

class SurfaceR10dcSpec extends SparkSpec {

  test("every R10dc query runs at sf0.001") {
    SurfaceR10dc.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp73: splits are disjoint in time with a real embargo gap") {
    val out = SurfaceR10dc.lp73TemporalSplit(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    val (trainRows, _, _, trainMax, trainShare) = out("train")
    assert(trainRows > 0 && trainShare > 0)
    out.get("test").foreach { case (_, _, testMin, _, _) =>
      assert(testMin > trainMax + 2,
        s"test starts $testMin, needs > trainMax $trainMax + embargo 2")
    }
    out.get("embargo").foreach { case (_, nDays, eMin, eMax, _) =>
      assert(eMin > trainMax && eMax <= trainMax + 2)
      assert(nDays <= 2)
    }
    assert(math.abs(out.values.map(_._5).sum - 1.0) < 1e-3,
      "split shares must sum to 1")
  }

  test("m185: pair sums match an exact replay and E >= 0") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val out = SurfaceR10dc.m185EnergyDistance(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    daily.foreach { case (t, rs) =>
      val sorted = rs.sortBy(_._2)
      val days = sorted.map(_._2)
      val md2 = {
        val ds = days.map(_ * 2).sorted
        val n = ds.length
        if (n % 2 == 1) ds(n / 2) else (ds(n / 2 - 1) + ds(n / 2)) / 2
      }
      val (e1, e2) = sorted.partition(r0 => r0._2 * 2 <= md2)
      val xs = e1.map(_._3); val ys = e2.map(_._3)
      def s2(a: Seq[Long], b: Seq[Long]) =
        a.flatMap(u => b.map(v => math.abs(u - v))).sum
      val (sxy, sxx, syy) = (s2(xs, ys), s2(xs, xs), s2(ys, ys))
      val (n1, n2, oxy, oxx, oyy, e) = out(t)
      assert(n1 == xs.length && n2 == ys.length, s"$t sizes")
      assert(oxy == sxy && oxx == sxx && oyy == syy, s"$t pair sums")
      assert(e >= -1e-9, s"$t energy $e negative")
    }
  }
}
