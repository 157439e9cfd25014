package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10by

class SurfaceR10bySpec extends SparkSpec {

  test("every R10by query runs at sf0.001") {
    SurfaceR10by.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m162: 2J matches a driver-side pairwise count") {
    val vals = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)").as("g"),
        expr("CAST(floor(o_totalprice / 1000) AS BIGINT)").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val groups = vals.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.map(_._2))
    var j2 = 0L
    for (i <- groups.indices; j <- i + 1 until groups.length) {
      // count via value histograms, not raw pairs
      val ha = groups(i).groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
      val hb = groups(j).groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
      for ((va, ca) <- ha; (vb, cb) <- hb) {
        if (va < vb) j2 += 2 * ca * cb
        else if (va == vb) j2 += ca * cb
      }
    }
    val row = SurfaceR10by.m162Jonckheere(spark, sfDir).collect().head
    assert(row.getLong(0) == j2, s"2J ${row.getLong(0)} vs $j2")
    assert(row.getLong(1) == vals.length)
    // z is finite and mu is the no-tie mean
    assert(!row.getDouble(3).isNaN)
  }

  test("m163: slope signs match a driver-side replay") {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"),
        col("o_orderpriority").as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def olsSlope(pts: Seq[(Long, Long)]): Double = {
      val n = pts.length.toDouble
      val st = pts.map(_._1.toDouble).sum
      val sy = pts.map(_._2.toDouble).sum
      val stt = pts.map(p => p._1.toDouble * p._1).sum
      val sty = pts.map(p => p._1.toDouble * p._2).sum
      (n * sty - st * sy) / (n * stt - st * st)
    }
    val pooled = olsSlope(daily.groupBy(_._1).map { case (t, xs) => (t, xs.length.toLong) }.toSeq)
    val opp = daily.groupBy(_._2).values.count { xs =>
      val s = olsSlope(xs.groupBy(_._1).map { case (t, g) => (t, g.length.toLong) }.toSeq)
      (s > 0) != (pooled > 0)
    }
    val row = SurfaceR10by.m163SimpsonAudit(spark, sfDir).collect().head
    assert(math.abs(row.getDouble(0) - pooled) < 1e-3)
    assert(row.getLong(1) == 5L)
    assert(row.getLong(2) == opp.toLong, s"opp ${row.getLong(2)} vs $opp")
    assert(row.getLong(3) == (if (opp > 0) 1L else 0L))
  }
}
