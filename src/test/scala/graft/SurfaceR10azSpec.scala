package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10az

class SurfaceR10azSpec extends SparkSpec {

  test("every R10az query runs at sf0.001") {
    SurfaceR10az.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp60: exact Jaccard matches a driver recompute and the sketch is calibrated") {
    val docs = Tables.documents(spark, sfDir)
      .where(col("doc_id") % 20 === 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSet)).toMap
    val rows = SurfaceR10az.lp60MinhashError(spark, sfDir).collect()
    val nDocs = docs.size
    assert(rows.length == nDocs * (nDocs - 1) / 2, "pair count")
    rows.foreach { r =>
      val (a, b) = (docs(r.getLong(0)), docs(r.getLong(1)))
      val inter = (a & b).size
      val exact = inter.toDouble / (a ++ b).size
      assert(r.getLong(2) == inter, s"inter for ${r.getLong(0)}-${r.getLong(1)}")
      assert(math.abs(r.getDouble(4) - exact) < 1e-3, "exact J")
      // estimate is a multiple of 1/8 and |err| consistent with columns
      assert((r.getDouble(3) * 8).round / 8.0 == r.getDouble(3))
      assert(math.abs(r.getDouble(5) -
        math.abs(r.getDouble(3) - r.getDouble(4))) < 2e-4)
    }
    // sketch calibration: with k=8 the RMS error should be well under 0.35
    val rms = math.sqrt(rows.map(r => math.pow(r.getDouble(5), 2)).sum / rows.length)
    assert(rms < 0.35, s"MinHash k=8 RMS error $rms implausibly large")
  }
}
