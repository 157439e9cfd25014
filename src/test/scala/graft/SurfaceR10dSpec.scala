package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10d

class SurfaceR10dSpec extends SparkSpec {

  test("every R10d query runs at sf0.001") {
    SurfaceR10d.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("w12: quartile sizes within each priority differ by at most 1") {
    val sizes = SurfaceR10d.w12Ntile(spark, sfDir)
      .groupBy("o_orderpriority", "quartile").count()
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)))
    sizes.foreach { case (prio, ns) =>
      assert(ns.length == 4, s"$prio has ${ns.length} buckets")
      assert(ns.max - ns.min <= 1, s"$prio uneven: ${ns.mkString(",")}")
    }
  }

  test("lt17: fold replays exactly against a driver-side recursion") {
    val out = SurfaceR10d.lt17Holt(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(avg("value").as("v"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val series = rows.sortBy(_._2).map(_._3)
      var l = series.head; var t = 0.0
      series.tail.foreach { v =>
        val l2 = 0.5 * v + 0.5 * (l + t)
        t = 0.15 * v - 0.15 * l + 0.85 * t // expanded: 0.3*(l2-l)+0.7*t
        l = l2
      }
      def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      val (n, lv, tr) = out(et)
      assert(n == series.length)
      assert(math.abs(lv - r4(l)) < 1e-9, s"$et level $lv vs ${r4(l)}")
      assert(math.abs(tr - r4(t)) < 1e-9, s"$et trend $tr vs ${r4(t)}")
    }
  }

  test("m71: survival is monotone nonincreasing in (0,1] per group") {
    val rows = SurfaceR10d.m71KaplanMeier(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.foreach { case (_, _, sv) =>
        assert(sv > 0.0 - 1e-12 && sv <= 1.0 + 1e-12, s"$g surv $sv")
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 <= a._3 + 1e-9, s"$g survival increased: $a -> $b")
        case _ =>
      }
    }
  }

  test("m71: at-risk counts replay against a driver-side recompute") {
    val out = SurfaceR10d.m71KaplanMeier(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("dur"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    out.foreach { case ((g, t), nRisk) =>
      val exp = base.count { case (gg, dd) => gg == g && dd >= t }
      assert(nRisk == exp, s"($g,$t): n_risk $nRisk vs $exp")
    }
  }
}
