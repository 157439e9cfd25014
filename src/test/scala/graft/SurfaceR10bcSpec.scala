package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bc

class SurfaceR10bcSpec extends SparkSpec {

  test("every R10bc query runs at sf0.001") {
    SurfaceR10bc.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m139: chi2 matches a driver-side midrank replay") {
    val weekly = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(expr(
        "CAST(floor(CAST(datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') AS BIGINT) / 7.0) AS BIGINT)")
        .as("wk"), col("o_orderpriority").as("pr"))
      .groupBy("wk", "pr").agg(count(lit(1)).as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).filter(_._2.length == 5)
    val k = 5
    val ranks = weekly.values.flatMap { rows =>
      val sorted = rows.sortBy(_._3)
      rows.map { case (_, pr, v) =>
        val below = rows.count(_._3 < v)
        val eq = rows.count(_._3 == v)
        // midrank = (minrank + maxrank)/2 = below + (eq+1)/2
        (pr, below + 1 + (eq - 1) / 2.0)
      }
    }.toSeq
    val b = weekly.size.toDouble
    val rj = ranks.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val a = ranks.map(r => r._2 * r._2).sum
    val c = b * k * (k + 1) * (k + 1) / 4.0
    val num = rj.values.map(r => math.pow(r - b * (k + 1) / 2.0, 2)).sum
    val chi2 = (k - 1) * num / (a - c)
    val res = SurfaceR10bc.m139Friedman(spark, sfDir).collect().head
    assert(res.getLong(0) == weekly.size)
    assert(math.abs(res.getDouble(1) - chi2) < math.abs(chi2) * 1e-3 + 1e-3,
      s"chi2 ${res.getDouble(1)} vs $chi2")
    assert(res.getDouble(2) >= res.getDouble(3), "max rank < min rank")
    assert(res.getDouble(2) <= 5.0 + 1e-9 && res.getDouble(3) >= 1.0 - 1e-9)
  }

  test("q43: bucket histogram matches a driver-side gap walk") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1992-01-01").cast("date")).cast("long").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def med2(v: Seq[Long]): Long = {
      val s = v.map(_ * 2).sorted
      val h = (s.length - 1) / 2.0
      val lo = s(h.toInt); val hi = s(math.ceil(h).toInt)
      (lo + (hi - lo) * (h - h.toInt)).toLong
    }
    val meds = orders.collect { case (_, ds) if ds.length >= 2 =>
      med2(ds.sliding(2).map(p => p(1) - p(0)).toSeq)
    }.toSeq
    val hist = meds.groupBy(m => math.floor(m / 60.0).toLong)
      .view.mapValues(_.length.toLong).toMap
    val rows = SurfaceR10bc.q43InterpurchaseGap(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum == meds.length,
      "customer count mismatch")
    rows.foreach { r =>
      assert(r.getLong(1) == hist(r.getLong(0)),
        s"bucket ${r.getLong(0)}: ${r.getLong(1)} vs ${hist(r.getLong(0))}")
    }
  }
}
