package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bd

class SurfaceR10bdSpec extends SparkSpec {

  test("every R10bd query runs at sf0.001") {
    SurfaceR10bd.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m140: limits and OOC count match a driver-side replay") {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val weeks = daily.groupBy(p => p._1 / 7).values
      .filter(_.size >= 2)
      .map { ds =>
        (ds.size, ds.map(_._2).sum, ds.map(_._2).max - ds.map(_._2).min) }
      .toSeq
    val b = weeks.length.toDouble
    val xbb = weeks.map(_._2).sum.toDouble / weeks.map(_._1).sum
    val rbar = weeks.map(_._3).sum / b
    val a2 = Map(2 -> 1.880, 3 -> 1.023, 4 -> 0.729, 5 -> 0.577, 6 -> 0.483)
    val ooc = weeks.count { case (nd, sw, _) =>
      val a = a2.getOrElse(nd, 0.419)
      val x = sw.toDouble / nd
      x > xbb + a * rbar || x < xbb - a * rbar
    }
    val r = SurfaceR10bd.m140ControlChart(spark, sfDir).collect().head
    assert(r.getLong(0) == weeks.length)
    assert(math.abs(r.getDouble(1) - xbb) < 1e-3)
    assert(math.abs(r.getDouble(2) - rbar) < 1e-3)
    assert(r.getLong(3) == ooc, s"OOC ${r.getLong(3)} vs $ooc")
  }

  test("x19: FILTER aggregates equal their CASE-WHEN twins") {
    val rows = SurfaceR10bd.x19FilterClause(spark, sfDir).collect()
    assert(rows.length == 5)
    val twin = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_orderpriority")
      .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("nf"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("no"),
        sum(when(col("o_orderstatus") === "F",
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .otherwise(0L)).as("fc"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.foreach { r =>
      val (nf, no, fc) = twin(r.getString(0))
      assert(r.getLong(1) == nf && r.getLong(2) == no && r.getLong(3) == fc,
        s"FILTER mismatch for ${r.getString(0)}")
    }
  }
}
