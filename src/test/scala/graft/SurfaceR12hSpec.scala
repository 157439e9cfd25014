package graft

import org.apache.spark.sql.functions._

/** Laws for round-12 batch 8: reliable checkpoint and Wilson CI. */
class SurfaceR12hSpec extends SparkSpec {

  test("x21: checkpointed pipeline equals the straight-through computation") {
    val out = queries.SurfaceR12h.x21ReliableCheckpoint(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val ref = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        Orc.r4(expr("CAST(sum(CAST(floor(o_totalprice * 1e4 + 5e-1) AS BIGINT))" +
          " AS DOUBLE) / 1e4")).as("revenue"),
        countDistinct("o_orderpriority").as("n_priorities"))
      .orderBy("c_mktsegment").collect().map(_.toSeq).toSeq
    assert(out === ref)
  }

  test("m211: Wilson bounds bracket p-hat and stay inside [0,1]") {
    val out = queries.SurfaceR12h.m211WilsonCi(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.where(col("wilson_lo") > col("p_hat") ||
      col("wilson_hi") < col("p_hat")).count() === 0)
    assert(out.where(col("wilson_lo") < 0 || col("wilson_hi") > 1).count() === 0)
    // the interval is non-degenerate whenever 0 < c < n
    assert(out.where(col("c") > 0 && col("c") < col("n") &&
      col("wilson_hi") <= col("wilson_lo")).count() === 0)
    out.unpersist()
  }

  test("m211: Wilson stays in-range where Wald would escape (extreme p, small n)") {
    // c=1, n=10: Wald lower bound p - 1.96*sqrt(p(1-p)/10) < 0; Wilson's
    // lower bound must be > 0 — the reason the operator exists
    val z = 1.959963984540054
    val p = 0.1; val n = 10.0
    val wald = p - z * math.sqrt(p * (1 - p) / n)
    val wilson = (p + z * z / (2 * n) - z * math.sqrt(p * (1 - p) / n +
      z * z / (4 * n * n))) / (1 + z * z / n)
    assert(wald < 0 && wilson > 0)
  }
}
