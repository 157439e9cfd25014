package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bz

class SurfaceR10bzSpec extends SparkSpec {

  test("every R10bz query runs at sf0.001") {
    SurfaceR10bz.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp66: canonical is the longest member (tie -> smallest id)") {
    val rows = SurfaceR10bz.lp66CanonicalSelection(spark, sfDir).collect()
    assert(rows.nonEmpty, "fixtures contain near-dup clusters")
    val chars = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (cid, sz, canon, cch, drop) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(drop == sz - 1)
      assert(chars(canon) == cch)
      // the canonical must be at least as long as the cluster id member
      assert(cch >= chars(cid))
      assert(sz >= 2)
    }
    // clusters are disjoint: canonical ids unique
    assert(rows.map(_.getLong(2)).distinct.length == rows.length)
  }
}
