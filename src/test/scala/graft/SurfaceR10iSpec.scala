package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10i

class SurfaceR10iSpec extends SparkSpec {

  /** Independent reference geohash: the published bisection algorithm
    * (alternating lon/lat range halving, base-32 every 5 bits) — no
    * shared code with the SQL closed form under test. */
  private def refGeohash(lat: Double, lon: Double, precision: Int): String = {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
    val sb = new StringBuilder
    var bit = 0; var ch = 0; var isLon = true
    while (sb.length < precision) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = ch * 2 + 1; lonLo = mid }
        else { ch = ch * 2; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = ch * 2 + 1; latLo = mid }
        else { ch = ch * 2; latHi = mid }
      }
      isLon = !isLon
      bit += 1
      if (bit == 5) { sb.append(alpha(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  test("every R10i query runs at sf0.001") {
    SurfaceR10i.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("f28: closed-form geohash matches the published bisection algorithm") {
    val rows = SurfaceR10i.f28Geohash(spark, sfDir).collect()
    assert(rows.length == Tables.customer(spark, sfDir).count())
    // exact (un-rounded) coordinates recomputed for the reference
    val exact = Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        expr(SurfaceR10i.synthLatSql("c_custkey")).cast("double").as("lat"),
        expr(SurfaceR10i.synthLonSql("c_custkey")).cast("double").as("lon"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    rows.foreach { r =>
      val (lat, lon) = exact(r.getLong(0))
      assert(r.getString(3) == refGeohash(lat, lon, 6),
        s"custkey ${r.getLong(0)}: ${r.getString(3)} vs ${refGeohash(lat, lon, 6)}")
    }
  }

  test("j16: binned overlap join equals the quadratic theta recompute") {
    val out = SurfaceR10i.j16IntervalOverlap(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("l_suppkey"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        expr("CAST(CAST(l_shipdate AS TIMESTAMP) AS BIGINT)").as("s0"),
        expr("(1 + l_partkey % 21) * 86400").as("tr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(2) + r.getLong(3)))
    val exp = li.groupBy(_._1).map { case (supp, xs) =>
      val pairs = for {
        a <- xs; b <- xs
        if a._2 < b._2 && a._3 <= b._4 && b._3 <= a._4
      } yield 1
      supp -> pairs.size.toLong
    }.filter(_._2 > 0)
    assert(out == exp, s"binned=${out.size} keys, brute=${exp.size} keys")
  }

  test("m73: NA hazard is nondecreasing and >= -ln(KM survival) ordering holds") {
    val rows = SurfaceR10i.m73NelsonAalen(spark, sfDir).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getDouble(4) >= a.getDouble(4) - 1e-9, "hazard decreased")
        case _ =>
      }
      // d/n <= -ln(1 - d/n): NA <= -ln(KM) pointwise
      sorted.foreach { r =>
        val dd = r.getLong(2).toDouble; val n = r.getLong(3).toDouble
        assert(dd / n <= -math.log(1.0 - math.min(dd / n, 0.999999)) + 1e-9)
      }
    }
  }

  test("m74: welch t matches a driver-side recompute") {
    val r = SurfaceR10i.m74WelchTtest(spark, sfDir).collect().head
    val vals = Tables.orders(spark, sfDir)
      .select("o_orderstatus", "o_totalprice").collect()
      .map(x => x.getString(0) -> x.getDouble(1))
    val f = vals.filter(_._1 == "F").map(_._2)
    val o = vals.filter(_._1 == "O").map(_._2)
    def meanVar(xs: Array[Double]): (Double, Double) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (m1, v1) = meanVar(f); val (m2, v2) = meanVar(o)
    val se = math.sqrt(v1 / f.length + v2 / o.length)
    val t = (m1 - m2) / se
    assert(r.getLong(0) == f.length && r.getLong(1) == o.length)
    assert(math.abs(r.getDouble(3) - t) < 1e-3, s"${r.getDouble(3)} vs $t")
    val df = math.pow(v1 / f.length + v2 / o.length, 2) /
      (math.pow(v1 / f.length, 2) / (f.length - 1) +
        math.pow(v2 / o.length, 2) / (o.length - 1))
    assert(math.abs(r.getDouble(4) - df) < 1e-2)
  }
}
