package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ai

class SurfaceR10aiSpec extends SparkSpec {

  test("every R10ai query runs at sf0.001") {
    SurfaceR10ai.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m114: grid C-index equals a driver-side brute-force pair count") {
    val r = SurfaceR10ai.m114SurvivalCindex(spark, sfDir).collect().head
    val data = Tables.orders(spark, sfDir).select(
      datediff(lit("1998-12-31").cast("date"),
        col("o_orderdate").cast("date")).cast("long"),
      (col("o_orderstatus") === "F").cast("long"),
      least(floor(col("o_totalprice") / 50000).cast("long"), lit(9L)))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    var num2 = 0L; var den2 = 0L; var nev = 0L
    data.foreach { case (di, ei, si) =>
      if (ei == 1L) {
        nev += 1
        data.foreach { case (dj, _, sj) =>
          if (dj > di) {
            den2 += 2
            if (sj < si) num2 += 2
            else if (sj == si) num2 += 1
          }
        }
      }
    }
    assert(r.getLong(0) == nev)
    assert(r.getLong(1) == den2 / 2,
      s"comparable ${r.getLong(1)} vs ${den2 / 2}")
    val expect = num2.toDouble / den2
    assert(math.abs(r.getDouble(2) - expect) < 1e-3,
      s"c-index ${r.getDouble(2)} vs $expect")
  }
}
