package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10cu

class SurfaceR10cuSpec extends SparkSpec {

  private def r4d(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
  private val P = 9223372036854775807L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("every R10cu query runs at sf0.001") {
    SurfaceR10cu.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m179: moments replay; return levels grow with horizon above the mean") {
    val daily = Tables.events(spark, sfDir)
      .select(expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)")
        .as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val weekly = daily.groupBy(_._1 / 7).map(_._2.map(_._2).max).toSeq
    val k = weekly.length
    val mean = weekly.sum.toDouble / k
    val sd = math.sqrt(weekly.map(v => (v - mean) * (v - mean)).sum / (k - 1))
    val beta = sd * math.sqrt(6.0) / math.Pi
    // mirror the query's quantized pipeline exactly (integer 1e-4 units)
    val mq = math.floor(mean * 1e4 + 0.5).toLong
    val bq = math.floor(beta * 1e4 + 0.5).toLong
    val muq = mq - math.floor(0.5772156649015329 * bq + 0.5).toLong
    def rlq(n: Int) = muq -
      math.floor(math.log(-math.log(1.0 - 1.0 / n)) * bq + 0.5).toLong
    val mu = muq / 1e4
    val r = SurfaceR10cu.m179GumbelEvd(spark, sfDir).collect().head
    assert(r.getLong(0) == k.toLong)
    assert(math.abs(r.getDouble(1) - mu) < 1e-12, "mu")
    assert(math.abs(r.getDouble(3) - rlq(10) / 1e4) < 1e-12, "rl10")
    assert(math.abs(r.getDouble(4) - rlq(52) / 1e4) < 1e-12, "rl52")
    // longer horizon -> higher provision; both above the block-max mean
    assert(r.getDouble(4) > r.getDouble(3) && r.getDouble(3) > mean)
  }

  test("lp69: additive over sources, order-invariant, and mutation-sensitive") {
    val rows = SurfaceR10cu.lp69DatasetFingerprint(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (allRow, perRows) = rows.partition(_._1 == "ALL")
    assert(allRow.length == 1 && perRows.nonEmpty)
    // additivity law: ALL = sum of per-source fingerprints mod p
    val sum = perRows.map(r => BigInt(r._3)).sum.mod(BigInt(P)).toLong
    assert(allRow.head._3 == sum, "additivity")
    assert(allRow.head._2 == perRows.map(_._2).sum)
    // replay one source's fingerprint from raw rows (order-independent
    // by construction: summation over a set)
    val src = perRows.head._1
    val docs = Tables.documents(spark, sfDir)
      .where(col("source") === src)
      .select("doc_id", "lang", "n_chars", "text").collect()
    val fp = docs.map { r =>
      val h = md5hex(s"${r.getLong(0)}|${r.getString(1)}|${r.getLong(2)}|${r.getString(3)}")
      h.take(12).foldLeft(0L)((a, c) => a * 16 + "0123456789abcdef".indexOf(c))
    }.map(BigInt(_)).sum.mod(BigInt(P)).toLong
    assert(perRows.head._3 == fp, s"replay of $src")
    // negative control: flipping one char of one doc changes the sum
    val mutated = {
      val h = md5hex(s"${docs.head.getLong(0)}|${docs.head.getString(1)}|${docs.head.getLong(2)}|X${docs.head.getString(3)}")
      h.take(12).foldLeft(0L)((a, c) => a * 16 + "0123456789abcdef".indexOf(c))
    }
    assert(mutated != fp)
  }
}
