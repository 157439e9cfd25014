package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bo

class SurfaceR10boSpec extends SparkSpec {

  test("every R10bo query runs at sf0.001") {
    SurfaceR10bo.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  private def daily: Array[(Long, Long)] =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

  test("m152: H matches a driver-side midrank replay") {
    val ds = daily
    val n = ds.length
    val all = ds.map(_._2).sorted
    // midrank of value v (1-based): count(below) + (count(at)+1)/2
    val below = all.zipWithIndex.groupBy(x => x._1)
      .map { case (v, xs) => v -> (xs.map(_._2).min, xs.length) }
    def midrank(v: Long): Double = {
      val (first, cnt) = below(v); first + (cnt + 1) / 2.0
    }
    val groups = ds.groupBy(_._1 % 7)
    val sr2 = groups.values.map { g =>
      val rj = g.map(p => midrank(p._2)).sum
      rj * rj / g.length
    }.sum
    val h = 12.0 / (n.toDouble * (n + 1)) * sr2 - 3.0 * (n + 1)
    val ties = all.groupBy(identity).values
      .map(g => g.length.toLong * g.length * g.length - g.length).sum
    val c = 1.0 - ties.toDouble / (n.toDouble * n * n - n)
    val row = SurfaceR10bo.m152KruskalWallis(spark, sfDir).collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - h) < 1e-2, s"h ${row.getDouble(1)} vs $h")
    assert(math.abs(row.getDouble(2) - h / c) < 1e-2)
    assert(row.getLong(3) == 6L)
    assert(row.getLong(4) == (if (h / c > 12.59) 1L else 0L))
  }

  test("lt48: motif counts match a driver-side replay") {
    val ds = daily
    val n = ds.length
    val s1 = ds.map(_._2).sum.toDouble
    val s2 = ds.map(p => p._2.toDouble * p._2).sum
    val mu = s1 / n
    val sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
    def symb(y: Long): String = {
      val z = (y - mu) / sd
      if (z < -0.6745) "a" else if (z < 0) "b" else if (z < 0.6745) "c" else "d"
    }
    val syms = ds.map(p => symb(p._2))
    val motifs = (2 until syms.length)
      .map(i => syms(i - 2) + syms(i - 1) + syms(i))
      .groupBy(identity).map { case (m, xs) => (m, xs.length.toLong) }
    val want = motifs.toSeq.sortBy(p => (-p._2, p._1)).take(5)
    val got = SurfaceR10bo.lt48SaxMotifs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want, s"got $got want $want")
  }
}
