package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bj

class SurfaceR10bjSpec extends SparkSpec {

  test("every R10bj query runs at sf0.001") {
    SurfaceR10bj.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lt42: K and D match an exact driver-side replay") {
    val counts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(_.getLong(1))
    val n = counts.sum
    val s2 = counts.map(c => c * c).sum
    val k = 1e4 * (s2.toDouble - n) / (n.toDouble * n)
    val simp = (s2.toDouble - n) / (n.toDouble * (n - 1))
    val row = SurfaceR10bj.lt42YuleK(spark, sfDir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == counts.length)
    assert(row.getLong(2) == counts.count(_ == 1))
    assert(row.getLong(3) == counts.count(_ == 2))
    assert(math.abs(row.getDouble(4) - k) < 1e-3)
    assert(math.abs(row.getDouble(5) - simp) < 1e-3)
  }

  test("m147: DBSCAN roles/clusters match an exact driver-side replay") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e4 + 0.5).toLong).toArray)
      .toMap
    val ids = vecs.keys.toSeq.sorted
    def d2(a: Long, b: Long): Long =
      vecs(a).indices.map(i => { val d = vecs(a)(i) - vecs(b)(i); d * d }).sum
    val nbrs = ids.map(a =>
      a -> ids.filter(b => b != a && d2(a, b) <= 170000000L)).toMap
    val cores = ids.filter(a => nbrs(a).size >= 2).toSet
    // components over core-core graph
    var comp = cores.map(c => c -> c).toMap
    var changed = true
    while (changed) {
      changed = false
      cores.foreach { c =>
        val m = (Seq(comp(c)) ++ nbrs(c).filter(cores).map(comp)).min
        if (m < comp(c)) { comp += c -> m; changed = true }
      }
    }
    val want = ids.map { a =>
      if (cores(a)) (a, "core", comp(a))
      else {
        val adjCores = nbrs(a).filter(cores)
        if (adjCores.nonEmpty) (a, "border", adjCores.map(comp).min)
        else (a, "noise", -1L)
      }
    }
    val got = SurfaceR10bj.m147Dbscan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
  }
}
