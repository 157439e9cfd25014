package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10cw

class SurfaceR10cwSpec extends SparkSpec {

  test("every R10cw query runs at sf0.001") {
    SurfaceR10cw.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt61: DF beta and t-ratio match a double-precision OLS replay") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (t, rs) => t -> rs.sortBy(_._2).map(_._3.toDouble) }
    val out = SurfaceR10cw.lt61Adf(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4))).toMap
    daily.foreach { case (typ, xs) =>
      val lagv = xs.dropRight(1); val dd = xs.tail.zip(lagv).map { case (a, b) => a - b }
      val m = dd.length
      val ml = lagv.sum / m; val md = dd.sum / m
      val sxy = lagv.zip(dd).map { case (a, b) => (a - ml) * (b - md) }.sum
      val sxx = lagv.map(a => (a - ml) * (a - ml)).sum
      val beta = sxy / sxx
      val rss = lagv.zip(dd).map { case (a, b) =>
        val e = b - md - beta * (a - ml); e * e }.sum
      val tStat = beta / math.sqrt(rss / (m - 2) / sxx)
      val (nDiffs, betaHat, dfT, reject) = out(typ)
      assert(nDiffs == m, s"$typ n_diffs $nDiffs vs $m")
      assert(math.abs(betaHat - beta) < 1e-3, s"$typ beta $betaHat vs $beta")
      assert(math.abs(dfT - tStat) < 1e-3, s"$typ t $dfT vs $tStat")
      assert(reject == (tStat < -2.86))
    }
  }

  test("m181: Bartlett statistic matches a double-precision replay") {
    val groups = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT)").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble)
      .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2) }
    val k = groups.size
    val cells = groups.values.map { xs =>
      val n = xs.length; val mean = xs.sum / n
      val s2 = xs.map(v => (v - mean) * (v - mean)).sum / (n - 1)
      (n, s2)
    }.toSeq
    val nTot = cells.map(_._1).sum
    val sp2 = cells.map { case (n, s2) => (n - 1) * s2 }.sum / (nTot - k)
    val num = (nTot - k) * math.log(sp2) -
      cells.map { case (n, s2) => (n - 1) * math.log(s2) }.sum
    val c = 1 + (cells.map(c0 => 1.0 / (c0._1 - 1)).sum - 1.0 / (nTot - k)) /
      (3.0 * (k - 1))
    val expect = num / c
    val r = SurfaceR10cw.m181Bartlett(spark, sfDir).collect().head
    assert(r.getLong(0) == k && r.getLong(1) == nTot)
    assert(math.abs(r.getDouble(3) - expect) < 1e-2,
      s"bartlett ${r.getDouble(3)} vs $expect")
    assert(r.getDouble(3) >= -1e-9, "Bartlett T is nonnegative (Jensen)")
    assert(r.getBoolean(4) == (expect > 9.488))
  }
}
