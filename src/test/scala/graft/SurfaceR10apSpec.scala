package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ap

class SurfaceR10apSpec extends SparkSpec {

  test("every R10ap query runs at sf0.001") {
    SurfaceR10ap.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp55: CI brackets the full mean and replicate weights are reproducible") {
    val r = SurfaceR10ap.lp55PoissonBootstrap(spark, sfDir).collect().head
    assert(r.getLong(0) == 16, "expected 16 replicates")
    val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lo <= hi, s"lo $lo > hi $hi")
    // Poisson-bootstrap CI of the mean should sit near the full mean;
    // with n in the thousands the half-width is small relative to it
    assert(lo < mean && mean < hi || math.abs(mean - lo) < mean * 0.05,
      s"CI [$lo, $hi] implausible vs mean $mean")
    // reproducibility: a second run is bit-identical (pure md5 weights)
    val r2 = SurfaceR10ap.lp55PoissonBootstrap(spark, sfDir).collect().head
    assert(r.toSeq == r2.toSeq, "bootstrap not reproducible")
  }

  test("lp55: md5 Poisson(1) weights have mean near 1") {
    val w = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), explode(expr("sequence(1, 16)")).as("r"))
      .select(expr {
        val u = "((" + (1 to 6).map { i =>
          s"(instr('0123456789abcdef', substr(md5(concat(o_orderkey, ':', r, ':boot')), $i, 1)) - 1) * ${1L << (4 * (6 - i))}"
        }.mkString(" + ") + " + 0.5) / 16777216.0)"
        s"""CASE WHEN $u < 0.36787944117144233 THEN 0
           | WHEN $u < 0.7357588823428847 THEN 1
           | WHEN $u < 0.9196986029286058 THEN 2
           | WHEN $u < 0.9810118431238463 THEN 3
           | WHEN $u < 0.9963401531726563 THEN 4
           | WHEN $u < 0.9994058151824183 THEN 5
           | ELSE 6 END""".stripMargin.replace("\n", "")
      }.as("w"))
      .agg(avg("w"), count(lit(1))).collect().head
    assert(math.abs(w.getDouble(0) - 1.0) < 0.05,
      s"Poisson weight mean ${w.getDouble(0)} far from 1")
  }

  test("m124: the reported best split beats every other candidate (brute recompute)") {
    val per = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(expr("CAST(floor(o_totalprice / 1000.0) AS BIGINT)").as("b"),
        expr("CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END").as("pos"))
      .groupBy("b").agg(count(lit(1)).as("cnt"), sum("pos").as("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val nTot = per.map(_._2).sum.toDouble
    val posTot = per.map(_._3).sum.toDouble
    def gini(p: Double, m: Double) = 2.0 * (p / m) * (1.0 - p / m)
    val gains = per.inits.toSeq.reverse.drop(1).map { prefix =>
      val nl = prefix.map(_._2).sum.toDouble
      val pl = prefix.map(_._3).sum.toDouble
      (prefix.last._1, if (nl >= nTot) Double.NaN
      else gini(posTot, nTot) - (nl / nTot) * gini(pl, nl) -
        ((nTot - nl) / nTot) * gini(posTot - pl, nTot - nl))
    }.filterNot(_._2.isNaN)
    val bestGain = gains.map(_._2).max
    val rows = SurfaceR10ap.m124BestSplit(spark, sfDir).collect()
    assert(rows.length == 5)
    assert(math.abs(rows.head.getDouble(2) - bestGain) < 1e-3,
      s"best gain ${rows.head.getDouble(2)} vs brute $bestGain")
    // descending gain order
    assert(rows.map(_.getDouble(2)).sliding(2).forall(p => p(0) >= p(1) - 1e-9))
  }
}
