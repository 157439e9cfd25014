package graft

import org.apache.spark.sql.functions._

import graft.queries.{SurfaceR6h, SurfaceR10j}

class SurfaceR10jSpec extends SparkSpec {

  test("every R10j query runs at sf0.001") {
    SurfaceR10j.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lg5: labels match a driver-side synchronous replay") {
    val out = SurfaceR10j.lg5LabelProp(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = SurfaceR6h.knnEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      lbl = adj.map { case (v, nbrs) =>
        val counts = nbrs.map(lbl).groupBy(identity)
          .map { case (l, xs) => (l, xs.size) }
        val best = counts.toSeq.sortBy { case (l, n) => (-n, l) }.head._1
        v -> best
      }.toMap
    }
    assert(out == lbl, "spark LPA != driver replay")
  }

  test("lg5: communities are coarser than singletons but not one blob") {
    val rows = SurfaceR10j.lg5LabelProp(spark, sfDir).collect()
    val nComm = rows.map(_.getLong(1)).distinct.length
    assert(nComm > 1, "collapsed to one community")
    assert(nComm < rows.length, "no propagation happened")
  }

  test("m75: log-rank pieces are consistent (chi2 = (o1-e1)^2/v1)") {
    val r = SurfaceR10j.m75Logrank(spark, sfDir).collect().head
    val o1 = r.getLong(0); val e1 = r.getDouble(1)
    val v1 = r.getDouble(2); val chi2 = r.getDouble(3)
    assert(v1 > 0)
    assert(math.abs(chi2 - (o1 - e1) * (o1 - e1) / v1) < 2e-3,
      s"chi2 $chi2 vs ${(o1 - e1) * (o1 - e1) / v1}")
  }

  test("lt20: rare-tail counts match a recount and mass is a probability") {
    val rows = SurfaceR10j.lt20GoodTuring(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count()
      .groupBy("count").agg(count(lit(1)).as("n_r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(vocab(r.getLong(0)) == r.getLong(1),
        s"fof mismatch at r=${r.getLong(0)}")
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1.0)
    }
    // the selected classes are the 10 smallest frequencies
    val minRs = vocab.keys.toSeq.sorted.take(rows.length)
    assert(rows.map(_.getLong(0)).toSeq.sorted == minRs)
  }

  test("lp33: class sizes sum to the table size; flag matches n >= 5") {
    val rows = SurfaceR10j.lp33KAnonymity(spark, sfDir).collect()
    assert(rows.map(_.getLong(2)).sum == Tables.customer(spark, sfDir).count())
    rows.foreach(r => assert(r.getBoolean(3) == (r.getLong(2) >= 5)))
  }
}
