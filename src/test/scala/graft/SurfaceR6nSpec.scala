package graft

import graft.queries.SurfaceR6n

class SurfaceR6nSpec extends SparkSpec {

  test("LP17: the curation funnel is monotone and conserves nothing it shouldn't") {
    val rows = SurfaceR6n.lp17CurationFunnel(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, q, k) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(raw >= q, "quality gate cannot add documents")
      assert(q >= k, "dedup cannot add documents")
      assert(k >= 0)
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.documents(spark, sfDir).count())
  }
}
