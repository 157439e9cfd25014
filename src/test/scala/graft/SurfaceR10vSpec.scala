package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10v

class SurfaceR10vSpec extends SparkSpec {

  test("every R10v query runs at sf0.001") {
    SurfaceR10v.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lf4: threshold kernel agrees with unbounded levenshtein") {
    val rows = SurfaceR10v.lf4BoundedEditJoin(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val full = org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(r.getString(0), r.getString(1))
      assert(full.toLong == r.getLong(2),
        s"${r.getString(0)} vs ${r.getString(1)}: kernel ${r.getLong(2)}, full $full")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 2)
    }
  }

  test("ls5: expansion changes the ranking vs the seed-only query") {
    val expanded = SurfaceR10v.ls5QueryExpansion(spark, sfDir).collect()
    assert(expanded.length == 5)
    // ranks are 1..5 and scores non-increasing
    assert(expanded.map(_.getLong(2)).toSeq == (1L to 5L))
    val scores = expanded.map(_.getDouble(1))
    scores.sliding(2).foreach { case Array(a, b) => assert(a >= b - 1e-9) }
    // expanded query scores use 5 terms, so top score must be >= any
    // single-term contribution: weak sanity that round 2 really ran
    assert(scores.head > 0.0)
  }
}
