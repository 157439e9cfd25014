package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10cx

class SurfaceR10cxSpec extends SparkSpec {

  test("every R10cx query runs at sf0.001") {
    SurfaceR10cx.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp70: IPF hits both marginal targets and conserves mass") {
    val rows = SurfaceR10cx.lp70Raking(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(4)))
    val n = rows.map(_._3).sum.toDouble
    val kl = rows.map(_._1).distinct.size
    val ks = rows.map(_._2).distinct.size
    // the final IPF pass matches source marginals; language marginals
    // are within IPF's one-pass residual
    val bySrc = rows.groupBy(_._2).map { case (_, rs) => rs.map(_._4).sum }
    bySrc.foreach(m => assert(math.abs(m - n / ks) < 0.05 * n / ks,
      s"source marginal $m vs ${n / ks}"))
    val byLang = rows.groupBy(_._1).map { case (_, rs) => rs.map(_._4).sum }
    byLang.foreach(m => assert(math.abs(m - n / kl) < 0.10 * n / kl,
      s"lang marginal $m vs ${n / kl}"))
    assert(math.abs(rows.map(_._4).sum - n) < 0.02 * n, "total mass drifts")
  }

  test("lp71: pairs are argmax-vs-margin-worse, capped per prompt") {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val out = SurfaceR10cx.lp71PreferencePairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (u, ps) =>
      assert(ps.length <= 2, s"user $u has ${ps.length} pairs")
      val cands = e(u)
      val top = cands.minBy(c => (-c._3, c._2))
      ps.foreach { case (_, chosenId, rejId, margin, _) =>
        assert(chosenId == top._2, s"user $u chosen $chosenId vs ${top._2}")
        assert(rejId != chosenId)
        assert(margin >= 50.0 - 1e-6, s"user $u margin $margin")
      }
    }
  }
}
