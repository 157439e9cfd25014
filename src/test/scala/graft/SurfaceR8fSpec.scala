package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR8f

class SurfaceR8fSpec extends SparkSpec {
  import spark.implicits._

  test("m31: kNN vote equals an integer-exact driver-side replay") {
    val got = SurfaceR8f.m31KnnVote(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Array[Float])].collect()
      .map { case (id, l, e) =>
        (id, l.toLong, e.map(v => math.floor(v.toDouble * 1e4 + 0.5).toLong))
      }
    val norms = vecs.map { case (id, _, q) => id -> q.map(x => x * x).sum }.toMap
    val want = vecs.filter(_._1 % 67 == 0).map { case (qid, ql, qq) =>
      val top5 = vecs.filter(_._1 != qid).map { case (cid, _, cq) =>
        val dot = (0 until 64).map(i => qq(i) * cq(i)).sum
        val cos = dot.toDouble /
          (math.sqrt(norms(qid).toDouble) * math.sqrt(norms(cid).toDouble))
        (cid, cos)
      }.sortBy { case (cid, cos) => (-cos, cid) }.take(5)
      val labelOf = vecs.map(v => v._1 -> v._2).toMap
      val (pred, nv) = top5.groupBy(t => labelOf(t._1))
        .map { case (l, g) => (l, g.length.toLong) }
        .toSeq.sortBy { case (l, n) => (-n, l) }.head
      (qid, ql, pred, nv)
    }.sortBy(_._1).toSeq
    assert(got == want, s"got ${got.take(3)} want ${want.take(3)}")
  }

  test("lt12: eta2 lies in [0,1] and n covers every event") {
    val got = SurfaceR8f.lt12SeasonalStrength(spark, sfDir)
      .as[(String, Long, Double, Long, Double)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (_, _, e2, _, _) => e2 >= -1e-3 && e2 <= 1.0 })
    assert(got.forall { case (_, _, _, dow, _) => dow >= 0 && dow <= 6 })
    assert(got.map(_._2).sum == Tables.events(spark, sfDir).count())
  }

  test("lg4: top-20 equals a driver-side brute-force Adamic-Adar") {
    val got = SurfaceR8f.lg4AdamicAdar(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.length == 20)
    val edges = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
      .distinct().as[(Long, Long)].collect()
    val byPart = edges.groupBy(_._2).filter { case (_, es) =>
      es.length > 1 && es.length <= 50
    }
    val acc = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    byPart.foreach { case (_, es) =>
      val w = math.floor(1e6 / math.log(es.length.toDouble) + 0.5).toLong
      val cs = es.map(_._1).sorted
      for (i <- cs.indices; j <- (i + 1) until cs.length) {
        val k = (cs(i), cs(j))
        val (s0, n0) = acc.getOrElse(k, (0L, 0L))
        acc(k) = (s0 + w, n0 + 1)
      }
    }
    val want = acc.toSeq.map { case ((a, b), (s, n)) =>
      (a, b, n, math.floor(s.toDouble / 1e6 * 1e4 + 0.5) / 1e4)
    }.sortBy { case (a, b, _, aa) => (-aa, a, b) }.take(20)
    assert(got == want, s"got ${got.take(3)} want ${want.take(3)}")
  }
}
