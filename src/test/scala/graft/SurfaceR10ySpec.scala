package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10y

class SurfaceR10ySpec extends SparkSpec {

  test("every R10y query runs at sf0.001") {
    SurfaceR10y.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m98: log loss beats the all-0.5 baseline bound and is positive") {
    val r = SurfaceR10y.m98LogLoss(spark, sfDir).collect().head
    val ll = r.getDouble(2)
    assert(ll > 0.0)
    // uniform random scores vs any base rate: expected log loss is
    // E[-ln U] = 1 for the hit class and E[-ln(1-U)] = 1 for the miss
    // class, so the aggregate sits near 1 nat — far from degenerate
    assert(ll > 0.5 && ll < 2.0, s"log loss implausible: $ll")
  }

  test("m99: NDCG in [0,1]; k equals the relevant count in the top-3") {
    val rows = SurfaceR10y.m99Ndcg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 3)
      val ndcg = r.getDouble(2)
      assert(ndcg >= -1e-9 && ndcg <= 1.0 + 1e-9, s"ndcg out of range: $ndcg")
      if (r.getLong(1) == 3) assert(ndcg > 0.99, "perfect hits must give 1")
      if (r.getLong(1) == 0) assert(ndcg == 0.0)
    }
  }

  test("a38: trimmed mean lies between group min and max; keeps ~90%") {
    val rows = SurfaceR10y.a38TrimmedMean(spark, sfDir).collect()
    rows.foreach { r =>
      val kept = r.getLong(2).toDouble / r.getLong(1)
      assert(kept > 0.8 && kept < 0.95, s"kept fraction $kept")
      assert(r.getDouble(3) > 0)
    }
    // trimmed mean is within the plain mean's ballpark per group
    val plain = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(avg("o_totalprice").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val ratio = r.getDouble(3) / plain(r.getString(0))
      assert(ratio > 0.7 && ratio < 1.3, s"trimmed/plain ratio $ratio")
    }
  }
}
