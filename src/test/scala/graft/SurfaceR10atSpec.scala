package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10at

class SurfaceR10atSpec extends SparkSpec {

  test("every R10at query runs at sf0.001") {
    SurfaceR10at.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt39: MASE matches a driver-side walk and the ratio is consistent") {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    val idx = daily.indices.drop(7)
    val sn = idx.map(i => math.abs(daily(i) - daily(i - 1))).sum.toDouble
    val ss = idx.map(i => math.abs(daily(i) - daily(i - 7))).sum.toDouble
    val r = SurfaceR10at.lt39Mase(spark, sfDir).collect().head
    assert(r.getLong(0) == idx.length, s"n_days ${r.getLong(0)} vs ${idx.length}")
    assert(math.abs(r.getDouble(1) - sn / idx.length) < 1e-3)
    assert(math.abs(r.getDouble(2) - ss / idx.length) < 1e-3)
    assert(math.abs(r.getDouble(3) - ss / sn) < 1e-3)
  }

  test("lp58: chunk arithmetic matches substring semantics on a sample") {
    val sample = Tables.documents(spark, sfDir)
      .select("doc_id", "text").orderBy("doc_id").limit(20).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = SurfaceR10at.lp58OverlappingChunks(spark, sfDir).collect()
      .filter(r => sample.contains(r.getLong(0)))
    assert(rows.length == sample.size)
    rows.foreach { r =>
      val t = sample(r.getLong(0))
      val starts = 1L to math.max(t.length.toLong, 1L) by 150L
      val emitted = starts.map(s =>
        t.substring((s - 1).toInt,
          math.min(t.length, (s - 1 + 200).toInt)).length.toLong).sum
      assert(r.getLong(1) == starts.length, s"n_chunks ${r.getLong(0)}")
      assert(r.getLong(2) == emitted, s"emitted ${r.getLong(0)}")
      assert(r.getLong(3) == emitted - t.length, s"overlap ${r.getLong(0)}")
    }
  }
}
