package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR8n

class SurfaceR8nSpec extends SparkSpec {
  import spark.implicits._

  test("m35: PSI terms are non-negative and the same-distribution total is stable") {
    val r = SurfaceR8n.m35Psi(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(r.map(_._1).toSeq == (0L to 9L))
    // (p-q)ln(p/q) >= 0 always (same sign factors)
    assert(r.forall(_._4 >= 0.0))
    // both halves draw from one distribution: PSI reads "stable"
    val psi = r.map(_._4).sum
    assert(psi < 0.1, s"PSI $psi should be noise-level")
    val n = Tables.events(spark, sfDir).count()
    assert(r.map(t => t._2 + t._3).sum == n)
  }

  test("q32: growth columns reconcile with the weekly totals") {
    val r = SurfaceR8n.q32WowGrowth(spark, sfDir)
      .as[(Long, Double, Option[Double], Option[Double])].collect()
    assert(r.length > 50)
    // first week has no prior: both growth columns null there, only there
    assert(r.head._3.isEmpty && r.head._4.isEmpty)
    assert(r.tail.forall(t => t._3.isDefined && t._4.isDefined))
    // abs growth telescopes back to the revenue series (within rounding)
    r.sliding(2).foreach {
      case Array(a, b) =>
        assert(math.abs(b._3.get - (b._2 - a._2)) < 2e-4,
          s"week ${b._1}: ${b._3.get} vs ${b._2 - a._2}")
      case _ =>
    }
  }
}
