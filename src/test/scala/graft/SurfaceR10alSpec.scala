package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10al

class SurfaceR10alSpec extends SparkSpec {

  test("every R10al query runs at sf0.001") {
    SurfaceR10al.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m117: IV is nonnegative and WoE signs track the bucket odds") {
    val rows = SurfaceR10al.m117WoeIv(spark, sfDir).collect()
    val (iv, buckets) = rows.partition(_.getString(0) == "TOTAL_IV")
    assert(iv.length == 1)
    assert(iv.head.getDouble(3) >= -1e-9, "information value negative")
    val (ngTot, nbTot) =
      (buckets.map(_.getLong(1)).sum.toDouble, buckets.map(_.getLong(2)).sum.toDouble)
    buckets.foreach { r =>
      val (ng, nb) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val expectSign = math.signum(
        math.log(((ng + 0.5) / (ngTot + 0.5)) / ((nb + 0.5) / (nbTot + 0.5))))
      assert(math.signum(r.getDouble(3)) == expectSign ||
        math.abs(r.getDouble(3)) < 1e-3,
        s"bucket ${r.getString(0)} WoE sign off")
    }
  }

  test("lp54: ESS bounded by n and consistent with Kish's formula") {
    val r = SurfaceR10al.lp54EffectiveSampleSize(spark, sfDir).collect().head
    val n = r.getLong(0)
    assert(r.getDouble(1) <= n + 1e-6)
    assert(r.getDouble(1) >= 1.0)
    assert(math.abs(r.getDouble(2) - r.getDouble(1) / n) < 1e-3)
    // length weights on this corpus are mild: ESS should stay above half
    assert(r.getDouble(2) > 0.5, s"weights collapsed the corpus: ${r.getDouble(2)}")
  }
}
