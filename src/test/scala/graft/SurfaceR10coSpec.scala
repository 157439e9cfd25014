package graft

import graft.queries.{SurfaceR10co, SurfaceR6h}

class SurfaceR10coSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("every R10co query runs at sf0.001") {
    SurfaceR10co.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lg11: trajectory matches a Luby replay; MIS is independent and maximal") {
    val edges = SurfaceR6h.knnEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val adj = und.groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    var active = adj.keySet
    var mis = Set.empty[Long]
    val expected = (1 to 4).map { r =>
      val pri = active.map(v => v -> md5hex(s"$v:$r")).toMap
      val winners = active.filter { v =>
        val nb = adj(v).intersect(active)
        nb.isEmpty || nb.forall(u => pri(v) < pri(u))
      }
      mis ++= winners
      active = active -- winners -- winners.flatMap(adj)
      (r.toLong, mis.size.toLong, active.size.toLong)
    }
    val rows = SurfaceR10co.lg11Mis(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.toSeq == expected.toSeq,
      s"got ${rows.toSeq} want ${expected.toSeq}")
    // independence: no edge inside the replayed MIS
    assert(!edges.exists { case (a, b) => mis(a) && mis(b) })
    // maximality over the retired set: every retired non-MIS vertex has
    // an MIS neighbor (vertices still active after 4 rounds are exempt)
    val retired = adj.keySet -- active
    (retired -- mis).foreach { v =>
      assert(adj(v).exists(mis), s"vertex $v retired without MIS neighbor")
    }
    // the fixture graph retires fully in 4 rounds
    assert(rows.last._3 == 0L)
  }

  test("lt57: the cut is the smallest prefix reaching the 99% target") {
    import org.apache.spark.sql.functions._
    val counts = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }
    val n = counts.map(_._2).sum
    val target = (99 * n + 99) / 100
    val cums = counts.scanLeft(0L)(_ + _._2).drop(1)
    val k = cums.indexWhere(_ >= target) + 1
    val cov = cums(k - 1)
    val r = SurfaceR10co.lt57VocabCoverage(spark, sfDir).collect().head
    assert(r.getLong(0) == n && r.getLong(1) == counts.length.toLong)
    assert(r.getLong(2) == k.toLong, s"k ${r.getLong(2)} vs $k")
    assert(math.abs(r.getDouble(3) -
      math.floor(cov.toDouble / n * 1e4 + 0.5) / 1e4) < 1e-12)
    // cutting one term earlier must fall below target (minimality)
    if (k > 1) assert(cums(k - 2) < target)
  }
}
