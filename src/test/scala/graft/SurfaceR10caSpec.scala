package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ca

class SurfaceR10caSpec extends SparkSpec {

  test("every R10ca query runs at sf0.001") {
    SurfaceR10ca.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m164: record count and H_n match a driver-side replay") {
    val ds = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var best = Long.MinValue
    var recs = 0L; var lastT = -1L
    ds.foreach { case (t, y) =>
      if (y > best) { recs += 1; lastT = t; best = y }
    }
    val hn = (1 to ds.length).map(1.0 / _).sum
    val row = SurfaceR10ca.m164RecordCounts(spark, sfDir).collect().head
    assert(row.getLong(0) == ds.length)
    assert(row.getLong(1) == recs, s"records ${row.getLong(1)} vs $recs")
    assert(row.getLong(2) == lastT)
    assert(math.abs(row.getDouble(3) - hn) < 1e-3)
    assert(math.abs(row.getDouble(4) - recs / hn) < 1e-2)
  }
}
