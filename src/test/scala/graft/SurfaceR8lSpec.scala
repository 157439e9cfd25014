package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR8l

class SurfaceR8lSpec extends SparkSpec {
  import spark.implicits._

  test("m34: gains accumulate to 1 and lift ends at exactly 1") {
    val r = SurfaceR8l.m34GainsTable(spark, sfDir)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(r.length == 10)
    // rows come best-bin-first; gain is monotone nondecreasing to 1.0
    assert(r.map(_._1).toSeq == (9L to 0L by -1))
    r.sliding(2).foreach {
      case Array(a, b) => assert(b._4 >= a._4)
      case _ =>
    }
    assert(r.last._4 == 1.0)
    // the full population has lift exactly 1 by definition
    assert(r.last._5 == 1.0)
    // a random score cannot beat random targeting by much
    assert(r.head._5 > 0.5 && r.head._5 < 1.5, s"top lift ${r.head._5}")
  }

  test("x15: pipe-syntax result equals the nested-SQL equivalent") {
    val got = SurfaceR8l.x15PipeSyntax(spark, sfDir)
      .as[(String, String, Long, Double)].collect().toSeq
    val want = Tables.lineitem(spark, sfDir)
      .where(col("l_quantity") >= 10)
      .withColumn("qrev",
        expr("CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4 + 5e-1) AS BIGINT)"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"), sum("qrev").as("qrev_sum"))
      .where(col("n_rows") > 100)
      .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
        (floor(col("qrev_sum").cast("double") / lit(1e4) * lit(1e4) + lit(0.5)) / lit(1e4))
          .as("revenue"))
      .orderBy("l_returnflag", "l_linestatus")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == want)
  }
}
