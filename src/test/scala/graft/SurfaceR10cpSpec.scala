package graft

import graft.queries.SurfaceR10cp

class SurfaceR10cpSpec extends SparkSpec {

  test("every R10cp query runs at sf0.001") {
    SurfaceR10cp.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("q47: LMDI contributions sum to the revenue delta exactly") {
    val r = SurfaceR10cp.q47KpiTree(spark, sfDir).collect().head
    val delta = r.getDouble(4)
    val sum = r.getDouble(5) + r.getDouble(6) + r.getDouble(7)
    // the log-mean identity: no residual term, only 1e-4 readout rounding
    assert(math.abs(delta - sum) < 4e-4, s"$delta vs $sum")
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
  }

  test("m175: OLS path identity c = c' + a*b; Sobel agrees in sign") {
    val r = SurfaceR10cp.m175Mediation(spark, sfDir).collect().head
    val c = r.getDouble(3); val cp = r.getDouble(4)
    val ind = r.getDouble(5)
    assert(math.abs(c - (cp + ind)) < 3e-4, s"c=$c cp=$cp ind=$ind")
    // a > 0 (more lines -> more units); the m|x partial on dollars is
    // data-determined (here negative: inconsistent mediation under the
    // collinear pair — exactly what the decomposition is for), so the
    // sign laws are relational, not absolute:
    assert(r.getDouble(1) > 0, "a_xm")
    assert(math.signum(r.getDouble(7)) == math.signum(ind), "sobel sign")
    assert(!r.getDouble(6).isNaN && !r.getDouble(7).isInfinite)
  }
}
