package graft

import org.apache.spark.sql.functions._

import graft.operators.Upsert
import graft.queries.SurfaceR8d

class SurfaceR8dSpec extends SparkSpec {
  import spark.implicits._

  // ---- LP26 / Upsert.applyCdc ----

  test("applyCdc: last-by-seq wins, deletes drop, headless updates survive") {
    val log = Seq(
      // key 1: insert then update -> update payload
      (1L, "a", "I", 1L), (1L, "b", "U", 2L),
      // key 2: insert then delete -> absent
      (2L, "c", "I", 1L), (2L, "d", "D", 2L),
      // key 3: insert, update, delete -> absent
      (3L, "e", "I", 1L), (3L, "f", "U", 2L), (3L, "g", "D", 3L),
      // key 4: update with no prior insert (mid-stream capture) -> kept
      (4L, "h", "U", 5L),
      // key 5: delete then later re-insert -> re-inserted payload
      (5L, "i", "D", 1L), (5L, "j", "I", 2L))
      .toDF("k", "payload", "op", "seq")
    val got = Upsert.applyCdc(log, Seq("k"), "seq", "op")
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq((1L, "b"), (4L, "h"), (5L, "j")), got.toString)
  }

  test("lp26: populations reconcile with the mod-5/mod-7 changelog construction") {
    val r = SurfaceR8d.lp26CdcApply(spark, sfDir)
      .select("o_orderpriority", "n_rows").as[(String, Long)].collect().toMap
    val keys = Tables.orders(spark, sfDir)
      .select("o_orderkey").as[Long].collect()
    val alive = keys.filterNot(_ % 7 == 0)
    assert(r.values.sum == alive.length)
    assert(r.getOrElse("0-REPRICED", 0L) == alive.count(_ % 5 == 0))
  }

  // ---- M30: nearest centroid ----

  test("m30: confusion matrix equals an integer-exact driver-side replay") {
    val got = SurfaceR8d.m30CentroidAssign(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Array[Float])].collect()
    assert(got.map(_._3).sum == vecs.length)
    // replay the exact quantized-integer math in plain Scala
    def quant(v: Float): Long = math.floor(v.toDouble * 1e4 + 0.5).toLong
    val qs = vecs.map { case (id, l, e) => (id, l, e.map(quant)) }
    val cents = qs.groupBy(_._2).map { case (l, vs) =>
      val n = vs.length
      val cq = (0 until 64).map { i =>
        math.floor(vs.map(_._3(i)).sum.toDouble / n + 0.5).toLong
      }.toArray
      l -> cq
    }
    val cnorm = cents.map { case (l, c) => l -> c.map(x => x * x).sum }
    val want = qs.map { case (id, l, q) =>
      val nv = q.map(x => x * x).sum
      val assigned = cents.toSeq.map { case (cl, cq) =>
        val dot = (0 until 64).map(i => q(i) * cq(i)).sum
        val cos = dot.toDouble / (math.sqrt(nv.toDouble) * math.sqrt(cnorm(cl).toDouble))
        (cl, cos)
      }.sortBy { case (cl, cos) => (-cos, cl) }.head._1
      (l.toLong, assigned.toLong)
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, v.length.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got == want, s"got ${got.take(5)} want ${want.take(5)}")
  }
}
