package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10di

class SurfaceR10diSpec extends SparkSpec {

  test("every R10di query runs at sf0.001") {
    SurfaceR10di.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m191: alpha matches an exact integer replay and is <= 1") {
    val cells = Tables.events(spark, sfDir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("ne"),
        sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val tn = cells.map(_._3).sum; val tc = cells.map(_._4).sum
    def lab(ne: Long, cents: Long): Int =
      if (10 * cents * tn < 8 * ne * tc) 0
      else if (10 * cents * tn < 10 * ne * tc) 1
      else if (10 * cents * tn < 12 * ne * tc) 2
      else 3
    val byUser = cells.groupBy(_._1).filter(_._2.size >= 2)
    var o12 = 0L; val n12 = scala.collection.mutable.Map[Int, Long]()
    var nv = 0L
    byUser.foreach { case (_, rs) =>
      val labs = rs.map(r => lab(r._3, r._4))
      val m = labs.size; nv += m
      for (i <- labs.indices; j <- labs.indices if i != j) {
        val w = 12L / (m - 1)
        if (labs(i) != labs(j)) o12 += w
        n12(labs(i)) = n12.getOrElse(labs(i), 0L) + w
      }
    }
    val s2 = n12.values.map(v => BigInt(v) * v).sum
    val alpha = 1.0 - 12.0 * o12 * (nv - 1) /
      (144.0 * nv * nv - s2.toDouble)
    val r = SurfaceR10di.m191Krippendorff(spark, sfDir).collect().head
    assert(r.getLong(0) == byUser.size && r.getLong(1) == nv)
    assert(math.abs(r.getDouble(5) - alpha) < 1e-3,
      s"alpha ${r.getDouble(5)} vs $alpha")
    assert(r.getDouble(5) <= 1.0 + 1e-9)
  }

  test("s28: one file, 25 records, stable fingerprint") {
    val a = SurfaceR10di.s28Wholetext(spark, sfDir).collect().head
    val nNation = Tables.nation(spark, sfDir).count()
    assert(a.getLong(0) == nNation, s"records ${a.getLong(0)} vs $nNation")
    assert(a.getLong(1) == 1L, "expected a single landed file")
    assert(a.getString(3).length == 32)
    val b = SurfaceR10di.s28Wholetext(spark, sfDir).collect().head
    assert(a.toString == b.toString, "fingerprint not stable across runs")
  }
}
