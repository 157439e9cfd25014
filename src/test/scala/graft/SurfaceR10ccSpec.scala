package graft

import graft.queries.SurfaceR10cc

class SurfaceR10ccSpec extends SparkSpec {

  test("every R10cc query runs at sf0.001") {
    SurfaceR10cc.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m167: dichotomy counts are consistent with the grand median") {
    // By construction of the median split, strictly-above count is at
    // most half the total, and the chi-square is nonnegative.
    val row = SurfaceR10cc.m167MoodMedian(spark, sfDir).collect().head
    val n = row.getLong(1); val above = row.getLong(2)
    assert(row.getLong(0) == 5L)
    assert(above * 2 <= n, s"above=$above n=$n")
    assert(row.getDouble(3) >= 0.0)
  }

  test("lp67: weights sum to 1 and alpha<1 flattens the distribution") {
    val rows = SurfaceR10cc.lp67TemperatureMix(spark, sfDir).collect()
    val wSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(wSum - 1.0) < 1e-2, s"weight sum $wSum")
    // Temperature alpha=0.3 < 1 upsamples below-average sources and
    // downsamples above-average ones: upsample factor must be >1 exactly
    // for sources whose share is below the geometric pivot, and the
    // ordering of weights must preserve the ordering of shares.
    // Both share and weight are rounded to 4 decimals, so sources whose
    // shares tie after rounding can carry weights a few 1e-4 apart in
    // either order — compare with a tolerance above that rounding noise.
    val byShare = rows.sortBy(_.getDouble(2))
    assert(byShare.map(_.getDouble(3)).zip(
      byShare.map(_.getDouble(3)).drop(1)).forall { case (a, b) => a <= b + 1e-3 })
    val smallest = byShare.head; val largest = byShare.last
    if (smallest.getDouble(2) < largest.getDouble(2)) {
      assert(smallest.getDouble(4) >= largest.getDouble(4))
    }
  }
}
