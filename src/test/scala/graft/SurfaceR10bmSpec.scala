package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bm

class SurfaceR10bmSpec extends SparkSpec {

  test("every R10bm query runs at sf0.001") {
    SurfaceR10bm.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  private def daily: Array[(Long, Long)] =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

  test("m151: numerator and T match an exact driver-side replay") {
    val ds = daily
    val a = ds.filter(_._1 < 1277).map(_._2)
    val b = ds.filter(_._1 >= 1277).map(_._2)
    val n1 = a.length.toLong; val n2 = b.length.toLong
    val grid = (a ++ b).distinct.sorted
    var num = BigInt(0)
    grid.foreach { v =>
      val c1 = a.count(_ <= v).toLong
      val c2 = b.count(_ <= v).toLong
      val c = (a.count(_ == v) + b.count(_ == v)).toLong
      val diff = BigInt(c1 * n2 - c2 * n1)
      num += BigInt(c) * diff * diff
    }
    val t = num.toDouble / ((n1 + n2).toDouble * (n1 + n2) * n1 * n2)
    val row = SurfaceR10bm.m151CramerVonMises(spark, sfDir).collect().head
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(BigInt(row.getLong(2)) == num, s"num ${row.getLong(2)} vs $num")
    assert(math.abs(row.getDouble(3) - t) < 1e-3)
  }

  test("lt45: powers match a driver-side replay; shares sum to ~1") {
    val ds = daily
    val n = ds.length.toLong
    val s1 = ds.map(_._2).sum
    val rows = SurfaceR10bm.lt45Periodogram(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(7L, 30L, 91L, 365L))
    rows.foreach { r =>
      val p = r.getLong(0)
      val sc = ds.map { case (t, y) =>
        (n * y - s1).toDouble * math.cos(2.0 * math.Pi * t / p) }.sum
      val ss = ds.map { case (t, y) =>
        (n * y - s1).toDouble * math.sin(2.0 * math.Pi * t / p) }.sum
      val pw = (sc * sc + ss * ss) / (n.toDouble * n * n * n)
      assert(math.abs(r.getDouble(1) - pw) < math.max(1e-3, pw * 1e-3),
        s"power(p=$p) ${r.getDouble(1)} vs $pw")
    }
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-2)
  }
}
