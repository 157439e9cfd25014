package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bn

class SurfaceR10bnSpec extends SparkSpec {

  test("every R10bn query runs at sf0.001") {
    SurfaceR10bn.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt46: closed-form EWMA equals the recursive Croston update") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .where(col("l_partkey") % 997 === 1)
      .select(col("l_orderkey"), expr("CAST(l_quantity AS BIGINT)").as("q"))
    val od = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1992-01-01").cast("date")).cast("long").as("t"))
    val events = li.join(od, "l_orderkey")
      .groupBy("t").agg(sum("q").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(events.length >= 2, "need an intermittent series")
    var z = events.head._2.toDouble
    var p = 0.0
    events.zipWithIndex.drop(1).foreach { case ((t, q), i) =>
      val gap = (t - events(i - 1)._1).toDouble
      z = 0.2 * q + 0.8 * z
      p = if (i == 1) gap else 0.2 * gap + 0.8 * p
    }
    val row = SurfaceR10bn.lt46Croston(spark, sfDir).collect().head
    assert(row.getLong(0) == events.length)
    assert(row.getLong(1) == events.map(_._2).sum)
    assert(math.abs(row.getDouble(2) - z) < 1e-3, s"z ${row.getDouble(2)} vs $z")
    assert(math.abs(row.getDouble(3) - p) < 1e-3, s"p ${row.getDouble(3)} vs $p")
    assert(math.abs(row.getDouble(4) - z / p) < 1e-2)
    assert(math.abs(row.getDouble(5) - 0.9 * z / p) < 1e-2)
  }

  test("lt47: energies match a driver-side replay and shares sum to 1") {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .where(col("t") >= 0 && col("t") < 2048)
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val y = Array.tabulate(2048)(t => daily.getOrElse(t.toLong, 0L))
    val rows = SurfaceR10bn.lt47HaarEnergy(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 6L))
    rows.foreach { r =>
      val j = r.getLong(0).toInt
      val size = 1 << j
      val half = size / 2
      // blocks with no present day yield no row (d = 0 contributes
      // nothing to ss either way); count only populated blocks.
      val populated = (0 until 2048 / size).filter { k =>
        (0 until size).exists(i => daily.contains((k * size + i).toLong))
      }
      val ds = populated.map { k =>
        val lo = (0 until half).map(i => y(k * size + i)).sum
        val hi = (0 until half).map(i => y(k * size + half + i)).sum
        lo - hi
      }
      val ss = ds.map(d => d * d).sum
      assert(r.getLong(1) == populated.size, s"blocks at level $j")
      assert(r.getLong(2) == ss, s"ss level $j: ${r.getLong(2)} vs $ss")
      assert(math.abs(r.getDouble(3) - ss.toDouble / size) < 1e-3)
    }
    val shares = rows.map(_.getDouble(4)).sum
    assert(math.abs(shares - 1.0) < 1e-2)
  }
}
