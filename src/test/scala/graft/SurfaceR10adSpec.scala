package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ad

class SurfaceR10adSpec extends SparkSpec {

  test("every R10ad query runs at sf0.001") {
    SurfaceR10ad.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("s24: zstd part files land and round-trip the 25 nations") {
    val rows = SurfaceR10ad.s24ParquetZstd(spark, sfDir).collect()
    assert(rows.length == 25)
    val parts = new java.io.File("target/tmp/s24_parquet_zstd")
      .listFiles().filter(_.getName.endsWith(".zstd.parquet"))
    assert(parts.nonEmpty, "no .zstd.parquet part files written")
  }

  test("a39: harmonic <= geometric-free check: harmonic <= arithmetic mean") {
    val harm = SurfaceR10ad.a39HarmonicMean(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val arith = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(avg("o_totalprice").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    harm.foreach { case (g, h) =>
      assert(h > 0)
      assert(h <= arith(g) + 1e-6, s"$g: harmonic $h above arithmetic ${arith(g)}")
      // same order of magnitude — sanity that the cents scaling is right
      assert(h > arith(g) * 0.1)
    }
  }
}
