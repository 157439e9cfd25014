package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10cz

class SurfaceR10czSpec extends SparkSpec {

  test("every R10cz query runs at sf0.001") {
    SurfaceR10cz.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m182: VIFs match a double-precision replay and are >= 1") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(expr("CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)").as("x"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("y"),
        expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("z"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble,
        r.getLong(2).toDouble))
    def corr(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.length
      val ma = a.sum / n; val mb = b.sum / n
      val num = a.zip(b).map { case (u, v) => (u - ma) * (v - mb) }.sum
      num / math.sqrt(a.map(u => (u - ma) * (u - ma)).sum *
        b.map(v => (v - mb) * (v - mb)).sum)
    }
    val (xs, ys, zs) = (rows.map(_._1).toSeq, rows.map(_._2).toSeq,
      rows.map(_._3).toSeq)
    val (rxy, rxz, ryz) = (corr(xs, ys), corr(xs, zs), corr(ys, zs))
    def vf(rjk: Double, rjl: Double, rkl: Double) =
      1.0 / (1.0 - (rjk * rjk + rjl * rjl - 2 * rjk * rjl * rkl) /
        (1.0 - rkl * rkl))
    val r = SurfaceR10cz.m182Vif(spark, sfDir).collect().head
    val expected = Seq(vf(rxy, rxz, ryz), vf(rxy, ryz, rxz), vf(rxz, ryz, rxy))
    Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)).zip(expected)
      .foreach { case (got, want) =>
        assert(math.abs(got - want) < 1e-3, s"vif $got vs $want")
        assert(got >= 1.0 - 1e-9, "VIF is >= 1 by construction")
      }
    // price is built from quantity: those two carry the collinearity
    assert(r.getDouble(4) == Seq(r.getDouble(1), r.getDouble(2),
      r.getDouble(3)).max)
  }

  test("a41: no false negatives; measured FPR stays near configured fpp") {
    val r = SurfaceR10cz.a41BloomFilter(spark, sfDir).collect().head
    val (nm, nn, hits) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(hits == nm, s"bloom dropped ${nm - hits} members (false negatives)")
    assert(nm > 0 && nn >= 0)
    assert(r.getBoolean(3), "FPR exceeded 2x the configured fpp")
  }
}
