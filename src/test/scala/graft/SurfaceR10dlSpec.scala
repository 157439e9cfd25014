package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10dl

class SurfaceR10dlSpec extends SparkSpec {

  test("every R10dl query runs at sf0.001") {
    SurfaceR10dl.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("a43: curve ends at (1,1), sits under the diagonal, masses replay") {
    val cents = Tables.orders(spark, sfDir)
      .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length; val tot = cents.sum
    val out = SurfaceR10dl.a43LorenzCurve(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length == 10)
    val last = out.maxBy(_._1)
    assert(math.abs(last._3 - 1.0) < 1e-9 && math.abs(last._4 - 1.0) < 1e-9)
    out.foreach { case (d, _, pop, value) =>
      assert(value <= pop + 1e-9,
        s"decile $d Lorenz above the diagonal ($value > $pop)")
    }
    // replay decile value masses from the sorted array
    val deciles = cents.zipWithIndex.groupBy { case (_, i) =>
      i.toLong * 10 / n }.view.mapValues(_.map(_._1).sum).toMap
    var cum = 0L
    out.sortBy(_._1).foreach { case (d, nd, _, value) =>
      cum += deciles(d)
      assert(math.abs(value - cum.toDouble / tot) < 1e-3,
        s"decile $d cum share $value vs ${cum.toDouble / tot}")
      assert(nd == cents.zipWithIndex.count(_._2.toLong * 10 / n == d))
    }
  }

  test("m193: interval brackets r and matches a Fisher-z replay") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("x"), sum("c").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val out = SurfaceR10dl.m193FisherZCi(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    daily.foreach { case (t, rs) =>
      val xs = rs.map(_._2.toDouble); val ys = rs.map(_._3.toDouble)
      val n = xs.length
      val mx = xs.sum / n; val my = ys.sum / n
      val r0 = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum /
        math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
          ys.map(b => (b - my) * (b - my)).sum)
      val z = 0.5 * math.log((1 + r0) / (1 - r0))
      val se = 1.96 / math.sqrt(n - 3.0)
      val (nd, rr, lo, hi, ex) = out(t)
      assert(nd == n)
      assert(math.abs(rr - r0) < 1e-3, s"$t r $rr vs $r0")
      assert(math.abs(lo - math.tanh(z - se)) < 1e-3, s"$t lo")
      assert(math.abs(hi - math.tanh(z + se)) < 1e-3, s"$t hi")
      assert(lo <= rr + 1e-9 && rr <= hi + 1e-9)
      assert(ex == (lo > 0 || hi < 0))
    }
  }
}
