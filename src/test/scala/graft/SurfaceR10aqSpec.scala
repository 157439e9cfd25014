package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10aq

class SurfaceR10aqSpec extends SparkSpec {

  test("every R10aq query runs at sf0.001") {
    SurfaceR10aq.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt37: runs/up/down counts match a driver-side walk of the series") {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("t"))
      .groupBy("t").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    val sgns = daily.sliding(2).collect {
      case Array(a, b) if a != b => if (b > a) 1 else -1
    }.toSeq
    val n1 = sgns.count(_ == 1).toLong
    val n2 = sgns.count(_ == -1).toLong
    val runs = 1L + sgns.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
    val r = SurfaceR10aq.lt37RunsTest(spark, sfDir).collect().head
    assert(r.getLong(0) == n1, s"n1 ${r.getLong(0)} vs $n1")
    assert(r.getLong(1) == n2, s"n2 ${r.getLong(1)} vs $n2")
    assert(r.getLong(2) == runs, s"runs ${r.getLong(2)} vs $runs")
    val mu = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    assert(math.abs(r.getDouble(3) - mu) < 1e-3)
  }

  test("m125: BH discoveries are exactly the step-up set of the reported p-values") {
    val rows = SurfaceR10aq.m125BhScreen(spark, sfDir).collect()
    assert(rows.length == 5)
    val m = rows.length
    val ps = rows.sortBy(_.getLong(5)).map(_.getDouble(4))
    // p sorted ascending by rank
    assert(ps.sliding(2).forall(p => p(0) <= p(1) + 1e-9))
    val kstar = (1 to m).filter(i => ps(i - 1) * m <= 0.10 * i + 1e-12)
      .lastOption.getOrElse(0)
    rows.foreach { r =>
      val expected = if (r.getLong(5) <= kstar) 1L else 0L
      assert(r.getLong(6) == expected,
        s"grp ${r.getString(0)} rank ${r.getLong(5)}: discovered ${r.getLong(6)} expected $expected")
    }
    // p-values are valid probabilities
    assert(ps.forall(p => p >= 0.0 && p <= 1.0))
  }
}
