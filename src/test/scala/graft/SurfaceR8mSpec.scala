package graft

import graft.queries.SurfaceR8m

class SurfaceR8mSpec extends SparkSpec {
  import spark.implicits._

  test("q31: all four statuses appear and reconcile with the mod constructions") {
    val r = SurfaceR8m.q31SnapshotDiff(spark, sfDir)
      .as[(String, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(r.keySet == Set("added", "removed", "changed", "unchanged"))
    val keys = Tables.orders(spark, sfDir)
      .select("o_orderkey").as[Long].collect()
    assert(r("added")._2 == keys.count(_ % 97 == 0))
    assert(r("removed")._2 == keys.count(_ % 7 == 0))
    assert(r("changed")._2 == keys.count(k => k % 5 == 0 && k % 7 != 0))
    assert(r("unchanged")._2 == keys.count(k => k % 5 != 0 && k % 7 != 0))
    // deltas: removed strictly loses revenue, changed strictly gains
    // (10% reprice), unchanged is exactly zero
    assert(r("removed")._3 < 0 && r("changed")._3 > 0)
    assert(r("unchanged")._3 == 0.0)
    assert(r("added")._3 > 0)
  }
}
