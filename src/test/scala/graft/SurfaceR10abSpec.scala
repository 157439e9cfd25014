package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ab

class SurfaceR10abSpec extends SparkSpec {

  test("every R10ab query runs at sf0.001") {
    SurfaceR10ab.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt35: MRR is the mean of the per-query reciprocal ranks") {
    val rows = SurfaceR10ab.lt35Mrr(spark, sfDir).collect()
    val (tot, perQ) = rows.partition(_.getString(0) == "TOTAL")
    assert(tot.length == 1)
    perQ.foreach { r =>
      val fr = r.getLong(1)
      assert(fr >= 0 && fr <= 3)
      val expect = if (fr == 0) 0.0 else 1.0 / fr
      assert(math.abs(r.getDouble(2) - expect) < 1e-3)
    }
    val mean = perQ.map(_.getDouble(2)).sum / perQ.length
    assert(math.abs(tot.head.getDouble(2) - mean) < 1e-3,
      s"TOTAL ${tot.head.getDouble(2)} vs mean $mean")
  }

  test("m102: Murphy identity BS = REL - RES + UNC holds") {
    val r = SurfaceR10ab.m102BrierDecomposition(spark, sfDir).collect().head
    val (rel, res, unc, bs) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(rel >= -1e-9 && res >= -1e-9 && unc >= 0)
    // the 3-term identity is exact only for forecasts constant within
    // each bin; with continuous scores the residual is the within-bin
    // variance, ~0.1^2/12 ~ 8e-4 for uniform scores in width-0.1 bins
    assert(math.abs(bs - (rel - res + unc)) < 5e-3,
      s"identity broken beyond within-bin variance: $bs vs ${rel - res + unc}")
    // random uniform scores against a low base rate: BS should be
    // dominated by the score variance, far from 0 and below 0.5
    assert(bs > 0.05 && bs < 0.6, s"implausible Brier score $bs")
  }
}
