package graft

import org.apache.spark.sql.functions._

/** Laws for round-12 batch 12: one-sample KS vs fitted exponential. */
class SurfaceR12lSpec extends SparkSpec {

  test("lt85: D in [0,1], critical band positive, decision consistent") {
    val out = queries.SurfaceR12l.lt85KsExponential(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.where(col("ks_d") < 0 || col("ks_d") > 1).count() === 0)
    assert(out.where(col("crit_95") <= 0).count() === 0)
    assert(out.where(col("reject_exponential") =!=
      (col("ks_d") > col("crit_95"))).count() === 0)
    out.unpersist()
  }

  test("lt85: true exponential sample passes, uniform sample rejects (hand data)") {
    import spark.implicits._
    // inverse-CDF exponential draws from a fixed uniform grid — the
    // empirical D of a perfect exponential sample is tiny; a UNIFORM
    // sample tested against a fitted exponential rejects strongly
    val n = 500
    def d(gaps: Seq[Long]): (Double, Double) = {
      val df = gaps.toDF("g")
      val sg = gaps.sum.toDouble
      val lam = gaps.length / sg
      val sorted = gaps.sorted
      val devs = sorted.zipWithIndex.map { case (g, i0) =>
        val f = 1.0 - math.exp(-lam * g)
        math.max((i0 + 1).toDouble / gaps.length - f,
          f - i0.toDouble / gaps.length)
      }
      (devs.max, 1.36 / math.sqrt(gaps.length))
    }
    val expGaps = (1 to n).map(i =>
      math.round(-math.log(1.0 - (i - 0.5) / n) * 1000000.0))
    val (dExp, crit) = d(expGaps)
    assert(dExp < crit, s"exponential fixture rejected: D=$dExp crit=$crit")
    val uniGaps = (1 to n).map(i => 1000000L + i) // near-constant gaps
    val (dUni, _) = d(uniGaps)
    assert(dUni > crit, s"uniform fixture not rejected: D=$dUni crit=$crit")
  }
}
