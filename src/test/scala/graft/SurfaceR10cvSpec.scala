package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10cv

class SurfaceR10cvSpec extends SparkSpec {

  test("every R10cv query runs at sf0.001") {
    SurfaceR10cv.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt60: the forecast prices the materialized banding join exactly") {
    val rows = SurfaceR10cv.lt60LshCostForecast(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(rows.keySet == Set(0L, 1L))
    // materialize the actual per-band candidate pairs with the l2b
    // construction and compare counts (with multiplicity, per band)
    val words = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        split(regexp_replace(lower(col("text")), "^\\W+|\\W+$", ""), "\\W+").as("w"))
    val shingles = words.where(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(sequence(lit(1), size(col("w")) - 2)).as("i"), col("w"))
      .select(col("doc_id"),
        concat_ws(" ", slice(col("w"), col("i"), lit(3))).as("tok"))
      .distinct()
    val hashed = shingles.select(col("doc_id"), explode(array(
      (0 until 8).map(i => struct(lit(i).as("h"),
        md5(concat_ws(":", lit(i.toString), col("tok")).cast("binary")).as("hv"))): _*)).as("e"))
    val bandKeys = hashed.groupBy(col("doc_id"), col("e.h").as("h"))
      .agg(min("e.hv").as("sig"))
      .groupBy(col("doc_id"), floor(col("h") / 4).as("band"))
      .agg(concat_ws("|",
        max(when(col("h") % 4 === 0, col("sig"))),
        max(when(col("h") % 4 === 1, col("sig"))),
        max(when(col("h") % 4 === 2, col("sig"))),
        max(when(col("h") % 4 === 3, col("sig")))).as("bkey"))
    val actual = bandKeys.as("x").join(bandKeys.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.band")).agg(count(lit(1)).as("pairs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (band, (_, nDocs, candPairs, maxBucket)) =>
      assert(actual.getOrElse(band, 0L) == candPairs,
        s"band $band forecast $candPairs vs actual ${actual.get(band)}")
      assert(maxBucket <= nDocs)
    }
  }

  test("x25: the profile equals the executed self-join cardinality") {
    val e = Tables.events(spark, sfDir).select("event_id", "user_id")
    val actual = e.as("a").join(e.as("b"), "user_id").count()
    val r = SurfaceR10cv.x25JoinSizeProfile(spark, sfDir).collect().head
    assert(r.getLong(2) == actual, s"exact_rows ${r.getLong(2)} vs $actual")
    assert(r.getLong(0) > 0 && r.getLong(1) > 0)
    // skew multiplier is >= 1 by Cauchy-Schwarz (sum c^2 >= n^2/ndv)
    assert(r.getDouble(4) >= 1.0 - 1e-9)
  }
}
