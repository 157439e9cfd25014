package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10dk

class SurfaceR10dkSpec extends SparkSpec {

  test("every R10dk query runs at sf0.001") {
    SurfaceR10dk.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("q48: latencies replay exactly; quartiles ordered") {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) DIV 1000000").as("sec"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val vc = scala.collection.mutable.ArrayBuffer[Long]()
    val cp = scala.collection.mutable.ArrayBuffer[Long]()
    e.foreach { case (_, rs) =>
      val views = rs.filter(_._2 == "view").map(_._3)
      if (views.nonEmpty) {
        val tv = views.min
        val clicks = rs.filter(r => r._2 == "click" && r._3 >= tv).map(_._3)
        if (clicks.nonEmpty) {
          val tc = clicks.min
          vc += tc - tv
          val buys = rs.filter(r => r._2 == "purchase" && r._3 >= tc).map(_._3)
          if (buys.nonEmpty) cp += buys.min - tc
        }
      }
    }
    val out = SurfaceR10dk.q48FunnelLatency(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    def q(xs: Seq[Long], p: Double): Double = {
      val s0 = xs.sorted; val rank = p * (s0.length - 1)
      val lo = s0(rank.toInt)
      val hi = s0(math.min(rank.toInt + 1, s0.length - 1))
      lo + (hi - lo) * (rank - rank.toInt)
    }
    Seq("view_to_click" -> vc.toSeq, "click_to_purchase" -> cp.toSeq)
      .foreach { case (t, xs) =>
        if (xs.nonEmpty) {
          val (n, q1, med, q3) = out(t)
          assert(n == xs.length, s"$t converters $n vs ${xs.length}")
          assert(math.abs(q1 - q(xs, 0.25)) < 1e-6, s"$t q1")
          assert(math.abs(med - q(xs, 0.5)) < 1e-6, s"$t med")
          assert(math.abs(q3 - q(xs, 0.75)) < 1e-6, s"$t q3")
          assert(q1 <= med && med <= q3)
        }
      }
  }

  test("x27: page 3 equals rows 21-30 of the fully sorted order") {
    val all = Tables.orders(spark, sfDir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey")).limit(30).collect().map(_.getLong(0))
    val page = SurfaceR10dk.x27LimitOffset(spark, sfDir).collect()
      .map(_.getLong(0))
    assert(page.length == 10)
    assert(page.toSeq == all.drop(20).toSeq, "page 3 mismatch")
  }
}
