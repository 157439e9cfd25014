package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10x

class SurfaceR10xSpec extends SparkSpec {

  test("every R10x query runs at sf0.001") {
    SurfaceR10x.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp43: noise is deterministic, bounded in probability, zero-centered-ish") {
    val a = SurfaceR10x.lp43DpCounts(spark, sfDir).collect()
    val b = SurfaceR10x.lp43DpCounts(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val trueCounts = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority", "o_orderstatus").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    a.foreach { r =>
      val t = trueCounts((r.getString(0), r.getString(1)))
      val noise = r.getDouble(2) - t
      // Laplace(1): |noise| > 15 has probability ~3e-7 per cell
      assert(math.abs(noise) < 15.0, s"implausible noise $noise")
    }
  }

  test("a37: buckets tile by powers of two and cover all orders") {
    val rows = SurfaceR10x.a37LogHistogram(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sfDir).count())
    rows.foreach { r =>
      val b = r.getInt(0)
      assert(r.getLong(2) >= (1L << b) && r.getLong(2) < (2L << b),
        s"min ${r.getLong(2)} outside bucket $b")
      assert(r.getLong(3) >= (1L << b) && r.getLong(3) < (2L << b),
        s"max ${r.getLong(3)} outside bucket $b")
    }
  }

  test("lt33: exactly 3 terms per source, scores descending") {
    val rows = SurfaceR10x.lt33DistinctiveTerms(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (src, g) =>
      assert(g.length == 3, s"$src has ${g.length} terms")
      val byRank = g.sortBy(_.getLong(1)).map(_.getDouble(3))
      byRank.sliding(2).foreach { case Array(x, y) =>
        assert(x >= y - 1e-9, s"$src scores not descending")
      }
    }
  }

  test("m97: Cook's D matches a driver-side recompute for the top row") {
    val rows = SurfaceR10x.m97CooksDistance(spark, sfDir).collect()
    assert(rows.length == 10)
    val per = Tables.lineitem(spark, sfDir).groupBy("l_orderkey")
      .agg(count(lit(1)).cast("double").as("x"),
        (floor(sum(col("l_extendedprice")) * 100 + lit(0.5)) / 1.0).as("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val n = per.length.toDouble
    val (sx, sy) = (per.map(_._2).sum, per.map(_._3).sum)
    val sxx = per.map(p => p._2 * p._2).sum
    val sxy = per.map(p => p._2 * p._3).sum
    val b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val b0 = sy / n - b1 * sx / n
    val resid = per.map(p => (p._1, p._2, p._3 - (b0 + b1 * p._2)))
    val s2 = resid.map(r => r._3 * r._3).sum / (n - 2)
    val dMap = resid.map { case (id, x, e) =>
      val h = 1.0 / n + (x - sx / n) * (x - sx / n) / (sxx - sx * sx / n)
      id -> e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))
    }.toMap
    val top = rows.head
    assert(math.abs(top.getDouble(2) - dMap(top.getLong(0))) < 1e-3,
      s"top Cook's D ${top.getDouble(2)} vs ${dMap(top.getLong(0))}")
    // reported rows really are the 10 largest
    val tenth = rows.map(_.getDouble(2)).min
    val larger = dMap.values.count(_ > tenth + 1e-3)
    assert(larger <= 10, s"$larger values exceed the reported 10th")
  }
}
