package graft

import graft.queries.SurfaceR8g

class SurfaceR8gSpec extends SparkSpec {
  import spark.implicits._

  test("q28: reach is the prefix sum of new users and ends at the user count") {
    val r = SurfaceR8g.q28CumulativeReach(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(r.nonEmpty)
    val users = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(r.last._3 == users)
    assert(r.scanLeft(0L)(_ + _._2).drop(1).zip(r.map(_._3)).forall {
      case (acc, reach) => acc == reach
    })
    assert(r.map(_._2).forall(_ > 0))
  }

  test("q29: LTV curves are monotone and normalize by cohort size") {
    val r = SurfaceR8g.q29CohortLtv(spark, sfDir)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(r.nonEmpty)
    // cumulative revenue never decreases along a cohort's curve
    r.groupBy(_._1).foreach { case (_, curve) =>
      val sorted = curve.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 >= a._4, s"LTV dipped: $a -> $b")
        case _ =>
      }
    }
    // per-user = total / size, up to the two independent 1e-4 roundings
    assert(r.forall { case (_, _, n, cum, per) =>
      math.abs(per - cum / n) <= 1e-4
    })
  }
}
