package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ar

class SurfaceR10arSpec extends SparkSpec {

  test("every R10ar query runs at sf0.001") {
    SurfaceR10ar.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m126: precision is hits/3 and recall denominators match the lang pool") {
    val langN = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val docLang = Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = SurfaceR10ar.m126PrecisionRecall(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hits = r.getLong(1)
      assert(math.abs(r.getDouble(2) - hits / 3.0) < 1e-3,
        s"P@3 for q ${r.getLong(0)}")
      val pool = langN(docLang(r.getLong(0))) - 1
      assert(math.abs(r.getDouble(3) - hits.toDouble / pool) < 1e-3,
        s"R@3 for q ${r.getLong(0)}")
      assert(hits >= 0 && hits <= 3)
    }
  }

  test("lt38: counts and grade match a driver-side regex recompute on a sample") {
    val sample = Tables.documents(spark, sfDir)
      .select("doc_id", "text").orderBy("doc_id").limit(20).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = SurfaceR10ar.lt38Readability(spark, sfDir).collect()
      .filter(r => sample.contains(r.getLong(0)))
    assert(rows.length == sample.size)
    rows.foreach { r =>
      val t = sample(r.getLong(0))
      val nSent = math.max(1, "[.!?]+".r.findAllIn(t).length)
      val nWords = math.max(1, "[a-z]+".r.findAllIn(t.toLowerCase).length)
      val nSyll = "[aeiouy]+".r.findAllIn(t.toLowerCase).length
      assert(r.getLong(1) == nSent, s"sent ${r.getLong(0)}")
      assert(r.getLong(2) == nWords, s"words ${r.getLong(0)}")
      assert(r.getLong(3) == nSyll, s"syll ${r.getLong(0)}")
      val fk = 0.39 * nWords.toDouble / nSent +
        11.8 * nSyll.toDouble / nWords - 15.59
      assert(math.abs(r.getDouble(4) - fk) < 1e-3, s"fk ${r.getLong(0)}")
    }
  }
}
