package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10e

class SurfaceR10eSpec extends SparkSpec {

  test("every R10e query runs at sf0.001") {
    SurfaceR10e.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m72: winsorized values are clipped, interior values untouched") {
    val out = SurfaceR10e.m72Winsorize(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bals = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val sorted = bals.map(_._2).sorted
    val lo = out.values.min; val hi = out.values.max
    // clip bounds sit at the 5th/95th percentile neighborhood
    assert(lo >= sorted.head && hi <= sorted.last)
    val nClippedLo = bals.count { case (k, v) => v < lo }
    val nClippedHi = bals.count { case (k, v) => v > hi }
    assert(nClippedLo > 0 && nClippedHi > 0, "nothing was clipped")
    assert(nClippedLo <= math.ceil(bals.length * 0.05).toInt + 1)
    assert(nClippedHi <= math.ceil(bals.length * 0.05).toInt + 1)
    bals.foreach { case (k, v) =>
      if (v > lo && v < hi)
        assert(math.abs(out(k) - math.floor(v * 1e4 + 0.5) / 1e4) < 1e-9)
    }
  }

  test("q34: digit shares sum to 1 and cover 1..9") {
    val rows = SurfaceR10e.q34Benford(spark, sfDir).collect()
    val digits = rows.map(_.getInt(0)).toSet
    assert(digits.subsetOf((1 to 9).toSet), s"bad digits $digits")
    val share = rows.map(_.getDouble(2)).sum
    assert(math.abs(share - 1.0) < 1e-2, s"shares sum to $share")
    // Benford expectation column is the closed form
    rows.foreach { r =>
      val d = r.getInt(0)
      val exp = math.log10(1.0 + 1.0 / d)
      assert(math.abs(r.getDouble(3) - math.floor(exp * 1e4 + 0.5) / 1e4) < 1e-9)
    }
  }

  test("a33: gini is in [0,1) and matches a driver-side recompute") {
    val out = SurfaceR10e.a33Gini(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val base = Tables.customer(spark, sfDir)
      .where(col("c_acctbal") > 0)
      .select("c_mktsegment", "c_acctbal", "c_custkey").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    base.groupBy(_._1).foreach { case (seg, rows) =>
      val xs = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val n = xs.length.toDouble
      val s = xs.sum
      val weighted = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val gini = 2.0 * weighted / (n * s) - (n + 1.0) / n
      assert(gini >= 0.0 && gini < 1.0, s"$seg gini $gini")
      assert(math.abs(out(seg) - math.floor(gini * 1e4 + 0.5) / 1e4) < 1e-9,
        s"$seg: ${out(seg)} vs $gini")
    }
  }
}
