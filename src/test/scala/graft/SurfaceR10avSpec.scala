package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10av

class SurfaceR10avSpec extends SparkSpec {

  test("every R10av query runs at sf0.001") {
    SurfaceR10av.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m133: conformal coverage honors the 90% target within sampling noise") {
    val r = SurfaceR10av.m133Conformal(spark, sfDir).collect().head
    val (nTr, nCal, nTe) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTr > 0 && nCal > 0 && nTe > 0)
    assert(r.getDouble(3) > 0, "qhat must be positive")
    val cov = r.getDouble(4)
    // split-conformal guarantee: coverage ≈ 0.9; allow binomial noise
    // (3 sigma at the sf0.001 test-split size)
    val sigma = 3 * math.sqrt(0.9 * 0.1 / nTe)
    assert(math.abs(cov - 0.9) < sigma + 0.05,
      s"coverage $cov too far from 0.9 (n_test=$nTe)")
  }

  test("m133: splits partition the joined rows") {
    val r = SurfaceR10av.m133Conformal(spark, sfDir).collect().head
    val total = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy(col("l_orderkey").as("o_orderkey")).agg(count(lit(1))),
        "o_orderkey")
      .count()
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) == total)
  }

  test("m136: pseudo-R2 is consistent with its own LL columns and near zero for a random scorer") {
    val r = SurfaceR10av.m136PseudoR2(spark, sfDir).collect().head
    val (llm, lln, r2) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lln > 0 && llm > 0)
    assert(math.abs(r2 - (1.0 - llm / lln)) < 1e-3)
    // md5 scores are independent of the label: the model explains nothing,
    // and log loss of a ~uniform p on a skewed label is WORSE than the
    // base rate, so R2 must be <= 0 and well away from +0.2
    assert(r2 < 0.05, s"random scorer got R2 $r2")
  }
}
