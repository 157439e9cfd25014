package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10r

class SurfaceR10rSpec extends SparkSpec {

  test("every R10r query runs at sf0.001") {
    SurfaceR10r.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("t20: every fixture day gets a PSI row; PSI nonneg; counts add up") {
    val rows = SurfaceR10r.t20StreamPsiDrift(spark, sfDir).collect()
    val nDays = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day")).distinct().count()
    assert(rows.length == nDays, s"${rows.length} windows vs $nDays days")
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getDouble(2) >= -1e-9, s"negative PSI: ${r.getDouble(2)}")
      assert(r.getBoolean(3) == (r.getDouble(2) > 0.2) ||
        math.abs(r.getDouble(2) - 0.2) < 1e-3)
    }
  }

  test("lt27: containment in [0,1]; matrix covers every co-occurring pair") {
    val rows = SurfaceR10r.lt27SourceOverlap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not canonically ordered")
      val c = r.getDouble(3)
      assert(c >= 0.0 && c <= 1.0 + 1e-9, s"containment out of range: $c")
      assert(r.getLong(2) >= 1)
    }
  }
}
