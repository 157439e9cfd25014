package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10bu

class SurfaceR10buSpec extends SparkSpec {

  test("every R10bu query runs at sf0.001") {
    SurfaceR10bu.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("lp65: draws resolve to the exact inverse-CDF tokens") {
    val counts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val n = counts.map(_._2).sum
    val cums = counts.scanLeft(("", 0L, 0L)) { case ((_, _, end), (w, c)) =>
      (w, end, end + c)
    }.drop(1) // (w, cumstart, cumend)
    def h24(key: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(6), 16)
    }
    val sampled = (1 to 64).map { r =>
      val target = h24(s"draw:$r") % n
      cums.find(c => target >= c._2 && target < c._3).get._1
    }
    val want = sampled.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val got = SurfaceR10bu.lp65MultinomialSampler(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == want, s"got $got want $want")
    assert(got.values.sum == 64L)
  }
}
