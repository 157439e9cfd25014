package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR8j

class SurfaceR8jSpec extends SparkSpec {
  import spark.implicits._

  test("q30: support/confidence/lift reconcile with raw basket counts") {
    val got = SurfaceR8j.q30BasketLift(spark, sfDir)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty && got.length <= 20)
    val items = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect()
    val nOrders = items.map(_._1).distinct.length
    val byPart = items.groupBy(_._2).map { case (p, g) => p -> g.length }
    val byOrder = items.groupBy(_._1).map { case (_, g) => g.map(_._2).sorted }
    got.foreach { case (a, b, nab, sup, conf, lift) =>
      val n = byOrder.count(ps => ps.contains(a) && ps.contains(b))
      assert(n == nab && nab >= 3, s"pair ($a,$b) nab=$nab recount=$n")
      def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
      assert(sup == r4(nab.toDouble / nOrders))
      assert(conf == r4(nab.toDouble / byPart(a)))
      assert(lift == r4(nab.toDouble * nOrders / (byPart(a).toDouble * byPart(b))))
      // a lift worth reporting is > 1 for these top pairs
      assert(lift > 1.0)
    }
  }

  test("m33: bins cover all events and rates hover at the base rate") {
    val got = SurfaceR8j.m33CalibrationBins(spark, sfDir)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.map(_._1).toSeq == (0L to 9L))
    val e = Tables.events(spark, sfDir)
    assert(got.map(_._2).sum == e.count())
    val base = e.where(col("event_type") === "purchase").count().toDouble / e.count()
    // the md5 score is independent of the outcome: every bin's observed
    // rate sits within a loose binomial band of the base rate
    got.foreach { case (bin, n, ms, rate) =>
      assert(ms >= bin / 10.0 - 0.05 && ms <= (bin + 1) / 10.0 + 0.05)
      val sd = math.sqrt(base * (1 - base) / n)
      assert(math.abs(rate - base) < 5 * sd, s"bin $bin rate $rate base $base")
    }
  }
}
