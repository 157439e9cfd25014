package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10n

class SurfaceR10nSpec extends SparkSpec {

  test("every R10n query runs at sf0.001") {
    SurfaceR10n.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt23: ratios in [0,1]; dup count bounded by shingle count") {
    val rows = SurfaceR10n.lt23ShingleDupRatio(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val ratio = r.getDouble(3)
      assert(ratio >= 0.0 && ratio <= 1.0 + 1e-9)
    }
  }

  test("lt24: Fano factor matches a driver-side recompute for one token") {
    val rows = SurfaceR10n.lt24Burstiness(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val tok = rows.head.getString(0)
    val perDoc = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("t")).collect()
      .map(r => r.getSeq[String](1).count(_ == tok).toDouble)
    val n = perDoc.length
    val mean = perDoc.sum / n
    val varp = perDoc.map(c => (c - mean) * (c - mean)).sum / n
    assert(math.abs(rows.head.getDouble(2) - varp / mean) < 1e-3,
      s"fano($tok): ${rows.head.getDouble(2)} vs ${varp / mean}")
  }

  test("lp36: exactly min(20, group size) per language, deterministic") {
    val a = SurfaceR10n.lp36ReservoirPerGroup(spark, sfDir).collect()
    val b = SurfaceR10n.lp36ReservoirPerGroup(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val sizes = Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a.groupBy(_.getString(0)).foreach { case (lang, g) =>
      assert(g.length == math.min(20L, sizes(lang)),
        s"$lang drew ${g.length} of ${sizes(lang)}")
    }
  }

  test("lp37: quotas sum to exactly 100 and respect proportionality") {
    val rows = SurfaceR10n.lp37QuotaAllocation(spark, sfDir).collect()
    assert(rows.map(_.getLong(4)).sum == 100L)
    val total = rows.map(_.getLong(1)).sum.toDouble
    rows.foreach { r =>
      val ideal = 100.0 * r.getLong(1) / total
      // largest-remainder never deviates more than 1 seat from the ideal
      assert(math.abs(r.getLong(4) - ideal) < 1.0 + 1e-9,
        s"${r.getString(0)}: quota ${r.getLong(4)} vs ideal $ideal")
    }
  }
}
