package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10dh

class SurfaceR10dhSpec extends SparkSpec {

  test("every R10dh query runs at sf0.001") {
    SurfaceR10dh.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("a42: Atkinson replay matches; indices rise with aversion here") {
    val xs = Tables.orders(spark, sfDir)
      .select(expr("CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0) AS BIGINT)").as("x"))
      .where(col("x") > 0).collect().map(_.getLong(0).toDouble)
    val n = xs.length; val mu = xs.sum / n
    def atk(eps: Double): Double =
      if (eps == 1.0) 1 - math.exp(xs.map(x => math.log(x / mu)).sum / n)
      else 1 - math.pow(xs.map(x => math.pow(x / mu, 1 - eps)).sum / n,
        1 / (1 - eps))
    val r = SurfaceR10dh.a42Atkinson(spark, sfDir).collect().head
    val got = Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))
    got.zip(Seq(atk(0.5), atk(1.0), atk(2.0))).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-3, s"atkinson $g vs $e")
      assert(g >= 0 && g < 1, s"index $g outside [0,1)")
    }
    // right-skewed dollars: more aversion -> more measured inequality
    assert(got(0) <= got(1) + 1e-9 && got(1) <= got(2) + 1e-9, got.toString)
  }

  test("lt67: PACF matches a Durbin-Levinson replay; AR passthrough removed") {
    val daily = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (t, rs) => t -> rs.sortBy(_._2).map(_._3) }
    val out = SurfaceR10dh.lt67Pacf(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).toMap
    daily.foreach { case (t, xs) =>
      val n = xs.length; val s = xs.sum
      val u = xs.map(x => (n.toLong * x - s).toDouble)
      val c0 = u.map(v => v * v).sum
      def ck(k: Int) = u.dropRight(k).zip(u.drop(k)).map { case (a, b) => a * b }.sum
      val (r1, r2, r3) = (ck(1) / c0, ck(2) / c0, ck(3) / c0)
      val p22 = (r2 - r1 * r1) / (1 - r1 * r1)
      val p21 = r1 * (1 - p22)
      val p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
      val (g1, g2, g3) = out(t)
      assert(math.abs(g1 - r1) < 1e-3, s"$t pacf1 $g1 vs $r1")
      assert(math.abs(g2 - p22) < 1e-3, s"$t pacf2 $g2 vs $p22")
      assert(math.abs(g3 - p33) < 1e-3, s"$t pacf3 $g3 vs $p33")
    }
  }
}
