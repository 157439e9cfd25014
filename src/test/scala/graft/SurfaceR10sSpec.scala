package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10s

class SurfaceR10sSpec extends SparkSpec {

  test("every R10s query runs at sf0.001") {
    SurfaceR10s.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp40: docs partition by language; fertility positive") {
    val rows = SurfaceR10s.lp40TokenizerFertility(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getDouble(4) > 0.0)
      // chars include separating spaces, so chars/token >= 2 for any
      // corpus of 1+-char tokens
      assert(r.getDouble(4) >= 1.0)
    }
  }

  test("lt28: dup counts consistent with a driver-side hash group count") {
    val rows = SurfaceR10s.lt28DupInflation(spark, sfDir).collect()
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val keeperOf = texts.groupBy(_._2).map { case (_, g) =>
      g.map(_._1).min
    }.toSet
    val expectDups = texts.count(t => !keeperOf.contains(t._1))
    assert(rows.map(_.getLong(2)).sum == expectDups)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      if (!r.isNullAt(5)) assert(r.getDouble(5) >= 1.0)
    }
  }

  test("m89: CI brackets the ratio; ratio matches a direct recompute") {
    val r = SurfaceR10s.m89RatioMetricCi(spark, sfDir).collect().head
    val ev = Tables.events(spark, sfDir)
    val rev = ev.where(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100 + lit(0.5)))).collect()
      .head.getLong(0).toDouble
    val nEv = ev.count().toDouble
    val expect = rev / nEv / 100.0
    assert(math.abs(r.getDouble(1) - expect) < 1e-3,
      s"ratio ${r.getDouble(1)} vs $expect")
    assert(r.getDouble(3) <= r.getDouble(1) + 1e-9)
    assert(r.getDouble(1) <= r.getDouble(4) + 1e-9)
    assert(r.getDouble(2) > 0)
  }

  test("m90: ECE in [0,1] over exactly 10 bins; small on uniform scores") {
    val r = SurfaceR10s.m90Ece(spark, sfDir).collect().head
    assert(r.getLong(1) == 10)
    val ece = r.getDouble(2)
    assert(ece >= 0.0 && ece <= 1.0)
    // hash-uniform scores are UNCALIBRATED vs the ~flat base rate:
    // ECE approximates E|bin_mid - base_rate| which for uniform bins
    // vs a constant is bounded well away from 1
    assert(ece < 0.6, s"ECE implausibly large: $ece")
  }
}
