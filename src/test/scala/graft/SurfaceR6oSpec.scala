package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR6o

class SurfaceR6oSpec extends SparkSpec {

  test("W10: the 6h range frame matches a per-row recompute") {
    val out = SurfaceR6o.w10TimeRangeFrame(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(4) >= 1)) // frame always includes self
    // brute-force recompute on the collected fixture (1k events)
    val raw = Tables.events(spark, sfDir)
      .withColumn("sec", expr("unix_micros(ts) div 1000000"))
      .select("event_id", "user_id", "sec", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byUser = raw.groupBy(_._2)
    out.foreach { r =>
      val (uid, sec, n) = (r.getLong(1), r.getLong(2), r.getLong(4))
      val window = byUser(uid).filter(e => e._3 >= sec - 21600 && e._3 <= sec)
      assert(window.size.toLong == n,
        s"event ${r.getLong(0)}: frame count $n != recompute ${window.size}")
      val sum = math.floor(window.map(_._4).sum * 1e4 + 0.5) / 1e4
      assert(math.abs(r.getDouble(3) - sum) < 2e-4)
    }
  }
}
