package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bh

class SurfaceR10bhSpec extends SparkSpec {

  test("every R10bh query runs at sf0.001") {
    SurfaceR10bh.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  private def base: Array[(Long, Long, Long)] =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("dur"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("ev"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("g1"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("m143: O1/E1/V/chi2 match a driver-side replay") {
    val rows = base
    val byT = rows.groupBy(_._1).toSeq.sortBy(_._1)
    val nTot = rows.length.toLong
    val n1Tot = rows.map(_._3).sum
    var left = 0L; var left1 = 0L
    var o1 = 0L; var e1 = 0.0; var v = 0.0; var times = 0
    byT.foreach { case (_, g) =>
      val d = g.map(_._2).sum
      val d1 = g.filter(_._3 == 1).map(_._2).sum
      val c = g.length.toLong
      val c1 = g.map(_._3).sum
      val n = nTot - left
      val n1 = n1Tot - left1
      if (d > 0 && n > 1) {
        times += 1
        o1 += d1
        e1 += d.toDouble * n1 / n
        v += d.toDouble * (n1.toDouble / n) * (1.0 - n1.toDouble / n) * (n - d) / (n - 1)
      }
      left += c; left1 += c1
    }
    val chi2 = (o1 - e1) * (o1 - e1) / v
    val r = SurfaceR10bh.m143LogRank(spark, sfDir).collect().head
    assert(r.getLong(0) == times)
    assert(r.getLong(1) == o1, s"o1 ${r.getLong(1)} vs $o1")
    assert(math.abs(r.getDouble(2) - e1) < 1e-3)
    assert(math.abs(r.getDouble(3) - v) < 1e-3)
    assert(math.abs(r.getDouble(4) - chi2) < 1e-2)
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
  }

  test("m144: cumulative hazard is nondecreasing and matches -ln(KM) loosely") {
    val rows = SurfaceR10bh.m144NelsonAalen(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var prev = 0.0
    rows.foreach { r =>
      assert(r.getDouble(3) >= prev - 1e-9, "cumhaz decreased")
      prev = r.getDouble(3)
      assert(r.getLong(1) > 0 && r.getLong(1) < r.getLong(2))
    }
    // d/n <= -ln(1 - d/n) term by term, so H <= -ln(S_KM) exactly; the
    // gap is second-order and small until n shrinks at the tail.
    val hFinal = rows.last.getDouble(3)
    val kmRep = {
      val byT = base.groupBy(_._1).toSeq.sortBy(_._1)
      val nTot = base.length.toLong
      var left = 0L; var lnS = 0.0
      byT.foreach { case (_, g) =>
        val d = g.map(_._2).sum; val c = g.length.toLong
        val n = nTot - left
        if (d > 0 && d < n) lnS += math.log(1.0 - d.toDouble / n)
        left += c
      }
      -lnS
    }
    assert(hFinal <= kmRep + 1e-9, s"H $hFinal exceeds -lnS $kmRep")
    assert(math.abs(hFinal - kmRep) / kmRep < 0.25, s"H $hFinal vs -lnS $kmRep")
  }
}
