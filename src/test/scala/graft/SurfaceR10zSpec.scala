package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10z

class SurfaceR10zSpec extends SparkSpec {

  test("every R10z query runs at sf0.001") {
    SurfaceR10z.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("u5/u6: bag algebra — intersectAll + exceptAll rebuild the O bag") {
    val o = Tables.orders(spark, sfDir)
      .where(col("o_orderstatus") === "O")
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val f = Tables.orders(spark, sfDir)
      .where(col("o_orderstatus") === "F")
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inter = SurfaceR10z.u5IntersectAll(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val diff = SurfaceR10z.u6ExceptAll(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    o.foreach { case (k, nO) =>
      val nF = f.getOrElse(k, 0L)
      assert(inter.getOrElse(k, 0L) == math.min(nO, nF),
        s"intersectAll($k): ${inter.getOrElse(k, 0L)} vs min($nO,$nF)")
      assert(diff.getOrElse(k, 0L) == math.max(0L, nO - nF),
        s"exceptAll($k): ${diff.getOrElse(k, 0L)} vs $nO-$nF")
    }
  }

  test("lp44: card totals reconcile with the corpus") {
    val rows = SurfaceR10z.lp44DatasetCard(spark, sfDir).collect()
    assert(rows.map(_.getLong(1)).sum ==
      Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 5)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(6) >= -1e-9 &&
        r.getDouble(6) <= math.log(r.getLong(3).toDouble) + 1e-3,
        "language entropy exceeds ln(n_langs)")
    }
  }

  test("t21: the engine's own input accounting matches the fixture") {
    val r = SurfaceR10z.t21StreamMetrics(spark, sfDir).collect().head
    assert(r.getLong(0) == Tables.events(spark, sfDir).count())
  }
}
