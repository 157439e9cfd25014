package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10db

class SurfaceR10dbSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("every R10db query runs at sf0.001") {
    SurfaceR10db.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m180: A-squared matches a double-precision replay") {
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val us = texts.map { case (id, t) =>
      (Integer.parseInt(md5hex(t).substring(0, 4), 16), id)
    }.sortBy(identity).map { case (h, _) => (h + 0.5) / 65536.0 }
    val n = us.length
    val s = us.zipWithIndex.map { case (u, i0) =>
      val i = i0 + 1
      (2 * i - 1) * math.log(u) + (2 * (n - i) + 1) * math.log(1 - u)
    }.sum
    val a2 = -n - s / n
    val r = SurfaceR10db.m180AndersonDarling(spark, sfDir).collect().head
    assert(r.getLong(0) == n)
    assert(math.abs(r.getDouble(1) - a2) < 1e-2,
      s"a2 ${r.getDouble(1)} vs $a2")
    assert(r.getBoolean(2) == (a2 < 2.492))
  }

  test("m184: W matches an exact rank replay and sits in [0,1]") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val panel = ev.groupBy(_._1).view.mapValues(_.size).toSeq
      .sortBy { case (u, c) => (-c, u) }.take(100).map(_._1)
    val types = ev.map(_._2).distinct.sorted
    val scores = ev.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val ranks = types.flatMap { t =>
      panel.map(u => (u, t, scores.getOrElse((u, t), 0L)))
        .sortBy { case (u, _, v) => (-v, u) }
        .zipWithIndex.map { case ((u, _, _), i) => (u, i + 1L) }
    }
    val ri = ranks.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val n = panel.size; val m = types.size
    val d2 = ri.values.map(v => { val d = 2 * v - m.toLong * (n + 1); d * d }).sum
    val w = 3.0 * d2 / (m.toDouble * m * (n.toDouble * n * n - n))
    val r = SurfaceR10db.m184KendallW(spark, sfDir).collect().head
    assert(r.getLong(0) == m && r.getLong(1) == n)
    assert(math.abs(r.getDouble(2) - w) < 1e-4,
      s"W ${r.getDouble(2)} vs $w")
    assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1 + 1e-9)
  }
}
