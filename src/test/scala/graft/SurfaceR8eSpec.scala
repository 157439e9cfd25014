package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR8e

class SurfaceR8eSpec extends SparkSpec {
  import spark.implicits._

  test("lt11: 25 cells, |acf| <= 1, and lag-1 matches a driver-side replay") {
    val got = SurfaceR8e.lt11Acf(spark, sfDir)
      .as[(String, Long, Long, Double)].collect()
    assert(got.length == 25)
    assert(got.forall { case (_, _, _, a) => a.abs <= 1.0 })
    // replay one series exactly (integer sums then double formula)
    val typ = got.head._1
    val series = Tables.events(spark, sfDir)
      .where(col("event_type") === typ)
      .select(expr("unix_micros(ts)").as("tu"), col("event_id"), col("value"))
      .orderBy("tu", "event_id")
      .as[(Long, Long, Double)].collect()
      .map(t => math.floor(t._3 * 1e4 + 0.5).toLong)
    val pairs = series.drop(1).zip(series.dropRight(1))
    val n = pairs.length.toLong
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val r = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (math.sqrt(n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        math.sqrt(n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    val want = math.floor(r * 1e4 + 0.5) / 1e4
    val cell = got.find(c => c._1 == typ && c._2 == 1L).get
    assert(cell._3 == n && cell._4 == want, s"$cell vs ($n, $want)")
  }

  test("q27: classes partition the parts and shares bracket 50/80") {
    val got = SurfaceR8e.q27AbcPareto(spark, sfDir)
      .as[(String, Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq("A", "B", "C"))
    val nParts = Tables.lineitem(spark, sfDir)
      .select("l_partkey").distinct().count()
    assert(got.map(_._2).sum == nParts)
    val total = got.map(_._3).sum
    val shareA = got(0)._3 / total
    val shareAB = (got(0)._3 + got(1)._3) / total
    // cumulative-share classing: A ends at ~50%, A+B at ~80% (within one
    // part's revenue of the cut, since the boundary part tips the class)
    assert(shareA <= 0.5 + 0.05 && shareA > 0.3, s"A share $shareA")
    assert(shareAB <= 0.8 + 0.05 && shareAB > 0.6, s"AB share $shareAB")
    // (no concentration assert: the synthetic revenue is near-uniform,
    // so class part-counts track the 50/30/20 revenue cuts instead of a
    // Pareto tail — the classing logic is what's under test)
  }
}
