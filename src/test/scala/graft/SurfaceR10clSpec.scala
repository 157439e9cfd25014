package graft

import graft.queries.SurfaceR10cl

class SurfaceR10clSpec extends SparkSpec {

  private def r4d(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  test("every R10cl query runs at sf0.001") {
    SurfaceR10cl.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m171: decomposition matches an OLS replay and bridges the gap") {
    import org.apache.spark.sql.functions._
    val data = Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("x"),
        expr("CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) DIV 100").as("y"))
      .join(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "x", "y").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def moments(seg: String) = {
      val g = data.filter(_._1 == seg)
      val n = g.length.toLong
      (n, g.map(_._2).sum, g.map(_._3).sum,
        g.map(v => v._2 * v._2).sum, g.map(v => v._2 * v._3).sum)
    }
    val (na, sxa, sya, sxxa, sxya) = moments("BUILDING")
    val (nb, sxb, syb, sxxb, sxyb) = moments("MACHINERY")
    def slope(n: Long, sx: Long, sy: Long, sxx: Long, sxy: Long): Double =
      (n * sxy.toDouble - sx.toDouble * sy) / (n * sxx.toDouble - sx.toDouble * sx)
    val gap = sya.toDouble / na - syb.toDouble / nb
    val explained = slope(nb, sxb, syb, sxxb, sxyb) *
      (sxa.toDouble / na - sxb.toDouble / nb)
    val r = SurfaceR10cl.m171OaxacaBlinder(spark, sfDir).collect().head
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    assert(math.abs(r.getDouble(2) - r4d(gap)) < 1e-12, "gap")
    assert(math.abs(r.getDouble(3) - r4d(explained)) < 1e-12, "explained")
    assert(math.abs(r.getDouble(4) - r4d(gap - explained)) < 1e-12)
    assert(math.abs(r.getDouble(6) -
      r4d(slope(nb, sxb, syb, sxxb, sxyb))) < 1e-12)
    // bridge identity on the published (rounded) numbers
    assert(math.abs(r.getDouble(2) - r.getDouble(3) - r.getDouble(4)) < 3e-4)
  }

  test("q45: matrix marginals match the tiered populations") {
    import org.apache.spark.sql.functions._
    val rows = SurfaceR10cl.q45SegmentMigration(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = rows.map(_._3).sum
    val active = Tables.orders(spark, sfDir)
      .where(year(col("o_orderdate")).isin(1996, 1997))
      .select("o_custkey").distinct().count()
    assert(total == active, s"matrix total $total vs active $active")
    // Quartile tiers: each year's four tier marginals are near n/4
    // (exact up to percentile-boundary ties).
    val fromCnt = rows.filter(_._1 != "NONE").groupBy(_._1)
      .map { case (t, rs) => t -> rs.map(_._3).sum }
    assert(fromCnt.keySet == Set("T1", "T2", "T3", "T4"))
    val n0 = fromCnt.values.sum.toDouble
    fromCnt.values.foreach(c => assert(math.abs(c - n0 / 4) <= n0 * 0.05 + 2))
    // entries and exits both occur in the fixture
    assert(rows.exists(r => r._1 == "NONE" && r._3 > 0))
    assert(rows.exists(r => r._2 == "NONE" && r._3 > 0))
  }
}
