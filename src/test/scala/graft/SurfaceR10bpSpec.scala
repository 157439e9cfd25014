package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bp

class SurfaceR10bpSpec extends SparkSpec {

  test("every R10bp query runs at sf0.001") {
    SurfaceR10bp.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp63: allocations sum to 1000 and follow Nh*Sh weights") {
    val rows = SurfaceR10bp.lp63NeymanAllocation(spark, sfDir).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(4)).sum == 1000L)
    // replay weights
    val strata = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderpriority").as("grp"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DIV 100").as("x"))
      .groupBy("grp").agg(count(lit(1)).as("nh"), sum("x").as("s1"),
        sum(expr("x * x")).as("s2"))
      .collect()
      .map { r =>
        val n = r.getLong(1).toDouble
        val sd = math.sqrt((r.getLong(3) - r.getLong(2).toDouble * r.getLong(2) / n) / (n - 1))
        r.getString(0) -> (r.getLong(1), n * sd)
      }.sortBy(_._1)
    val wtot = strata.map(_._2._2).sum
    val quotas = strata.map(p => (p._1, 1000.0 * p._2._2 / wtot))
    val bases = quotas.map(q => (q._1, math.floor(q._2).toLong, q._2 - math.floor(q._2)))
    val left = 1000L - bases.map(_._2).sum
    val bumped = bases.sortBy(b => (-b._3, b._1)).zipWithIndex
      .map { case ((g, b, _), i) => g -> (if (i < left) b + 1 else b) }.toMap
    rows.foreach { r =>
      assert(r.getLong(4) == bumped(r.getString(0)),
        s"alloc ${r.getString(0)}: ${r.getLong(4)} vs ${bumped(r.getString(0))}")
      assert(r.getLong(1) == strata.find(_._1 == r.getString(0)).get._2._1)
    }
  }

  test("f29: bitwise aggregates match a driver-side fold") {
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderpriority"), expr("o_orderkey % 65536").as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = base.groupBy(_._1).map { case (g, xs) =>
      val m1s = xs.map(x => (x._2 << 1) & 65535L)
      val m2s = xs.map(x => (x._2 >> 2) | 4096L)
      val m3s = xs.map(x => x._2 ^ 21845L)
      g -> (m1s.reduce(_ & _), m2s.reduce(_ | _), m3s.reduce(_ ^ _), xs.length.toLong)
    }
    val got = SurfaceR10bp.f29Bitwise(spark, sfDir).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (a, o, x, n) = want(r.getString(0))
      assert(r.getLong(1) == a && r.getLong(2) == o && r.getLong(3) == x && r.getLong(4) == n,
        s"bitwise mismatch for ${r.getString(0)}")
    }
  }
}
