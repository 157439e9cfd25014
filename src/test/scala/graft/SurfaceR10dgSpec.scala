package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10dg

class SurfaceR10dgSpec extends SparkSpec {

  test("every R10dg query runs at sf0.001") {
    SurfaceR10dg.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m190: RMST is bounded by tau and matches a KM replay") {
    val base = Tables.orders(spark, sfDir).select(
      col("o_orderpriority").as("grp"),
      datediff(lit("1998-12-31").cast("date"),
        col("o_orderdate").cast("date")).cast("long").as("dur"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("ev"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val out = SurfaceR10dg.m190Rmst(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    base.foreach { case (g, rows) =>
      val byT = rows.groupBy(_._2).view
        .mapValues(rs => (rs.map(_._3).sum, rs.size.toLong)).toSeq
        .sortBy(_._1)
      val nTot = rows.size.toLong
      var atRisk = nTot; var s = 1.0; var prevT = 0L; var prevS = 1.0
      var area = 0.0; var lastT = -1L; var lastS = 1.0
      byT.foreach { case (t, (dd, c)) =>
        if (dd > 0 && dd < atRisk) {
          val sNew = s * (1.0 - dd.toDouble / atRisk)
          if (t <= 365) {
            area += math.floor(prevS * (t - prevT) * 1e6 + 0.5) / 1e6
            lastT = t; lastS = sNew
            prevT = t; prevS = sNew
          }
          s = sNew
        }
        atRisk -= c
      }
      if (lastT >= 0) {
        area += math.floor(lastS * (365 - lastT) * 1e6 + 0.5) / 1e6
        val got = out(g)
        assert(got <= 365 + 1e-6, s"$g RMST $got exceeds tau")
        assert(math.abs(got - area) < 1e-3, s"$g RMST $got vs replay $area")
      }
    }
  }

  test("lt66: the chosen split maximizes the exact SSE gain") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, rs) => t -> rs.sortBy(_._2) }
    val out = SurfaceR10dg.lt66BinarySegmentation(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(6))).toMap
    daily.foreach { case (t, rows) =>
      val xs = rows.map(_._3); val n = xs.length
      val st = xs.sum
      var best = Double.NegativeInfinity; var bestDay = Long.MaxValue
      var s1 = 0L
      for (k <- 0 until n - 1) {
        s1 += xs(k)
        val n1 = k + 1L; val n2 = n - n1; val s2 = st - s1
        val gain = s1.toDouble * s1 / n1 + s2.toDouble * s2 / n2 -
          st.toDouble * st / n
        if (gain > best) { best = gain; bestDay = rows(k)._2 }
      }
      val (gotDay, gotGain) = out(t)
      assert(gotDay == bestDay, s"$t split $gotDay vs $bestDay")
      assert(math.abs(gotGain - best) < 1e-2, s"$t gain $gotGain vs $best")
    }
  }
}
