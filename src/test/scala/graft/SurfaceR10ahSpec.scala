package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ah

class SurfaceR10ahSpec extends SparkSpec {

  test("every R10ah query runs at sf0.001") {
    SurfaceR10ah.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m110: Wilson bounds bracket the rate and stay inside [0,1]") {
    val rows = SurfaceR10ah.m110WilsonCi(spark, sfDir).collect()
    rows.foreach { r =>
      val (rate, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo >= 0.0 - 1e-9 && hi <= 1.0 + 1e-9, s"bounds escape [0,1]: $lo $hi")
      assert(lo <= rate + 1e-9 && rate <= hi + 1e-9, s"rate $rate outside [$lo,$hi]")
      // interval width shrinks like 1/sqrt(n)
      assert(hi - lo < 2.5 / math.sqrt(r.getLong(1).toDouble),
        s"implausibly wide CI at n=${r.getLong(1)}")
    }
  }

  test("m112: kappa matches a driver-side recompute from raw votes") {
    val r = SurfaceR10ah.m112FleissKappa(spark, sfDir).collect().head
    val votes = Tables.orders(spark, sfDir).select(
      col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long") +
        (col("o_totalprice") > 150000.0).cast("long") +
        (col("o_orderdate") >= lit("1998-01-01").cast("timestamp")).cast("long"))
      .collect().map(_.getLong(0))
    val n = votes.length.toDouble
    val pBar = votes.map(v =>
      (v * v + (3 - v) * (3 - v) - 3).toDouble / 6.0).sum / n
    val pHi = votes.sum / (3.0 * n)
    val pe = pHi * pHi + (1 - pHi) * (1 - pHi)
    val kappa = (pBar - pe) / (1 - pe)
    assert(r.getLong(0) == votes.length)
    assert(math.abs(r.getDouble(2) - pBar) < 1e-3)
    assert(math.abs(r.getDouble(4) - kappa) < 1e-3,
      s"kappa ${r.getDouble(4)} vs $kappa")
  }
}
