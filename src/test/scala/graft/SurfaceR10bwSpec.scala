package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bw

class SurfaceR10bwSpec extends SparkSpec {

  test("every R10bw query runs at sf0.001") {
    SurfaceR10bw.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt50: validity matches a driver-side Luhn fold") {
    def luhnOk(key: Long): Boolean = {
      val cc = f"$key%016d"
      val sum = cc.zipWithIndex.map { case (ch, j) =>
        val d = ch - '0'
        if (j % 2 == 0) { val dd = 2 * d; if (dd > 9) dd - 9 else dd } else d
      }.sum
      sum % 10 == 0
    }
    val want = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderpriority"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (g, xs) => g -> (xs.length.toLong, xs.count(x => luhnOk(x._2)).toLong) }
    val got = SurfaceR10bw.lt50LuhnCheck(spark, sfDir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, v) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == v,
        s"luhn ${r.getString(0)}: (${r.getLong(1)},${r.getLong(2)}) vs ($n,$v)")
    }
    // ~10% of random 16-digit strings pass Luhn
    val rate = got.map(_.getLong(2)).sum.toDouble / got.map(_.getLong(1)).sum
    assert(rate > 0.03 && rate < 0.25, s"rate $rate")
  }

  test("m159: chi2/dispersion match a driver-side replay") {
    val ys = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(_.getLong(1))
    val n = ys.length.toDouble
    val mean = ys.sum / n
    val chi2 = ys.map(y => (y - mean) * (y - mean) / mean).sum
    val disp = ys.map(y => (y - mean) * (y - mean)).sum / (n - 1) / mean
    val row = SurfaceR10bw.m159DispersionTest(spark, sfDir).collect().head
    assert(row.getLong(0) == ys.length)
    assert(math.abs(row.getDouble(1) - chi2) < math.abs(chi2) * 1e-3 + 1e-2)
    assert(row.getLong(2) == ys.length - 1L)
    assert(math.abs(row.getDouble(3) - disp) < 1e-3)
    assert(row.getLong(4) == (if (disp > 1.2) 1L else 0L))
  }
}
