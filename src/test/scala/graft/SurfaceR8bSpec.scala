package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR8b

class SurfaceR8bSpec extends SparkSpec {
  import spark.implicits._

  // ---- Q24: sweep-line concurrency ----

  test("q24: deltas telescope — the final running sum closes every interval") {
    val r = SurfaceR8b.q24OpenOrders(spark, sfDir)
      .select("day", "net", "n_open").as[(Long, Long, Long)].collect()
    assert(r.nonEmpty)
    // every order opened is eventually closed: the sweep ends at zero
    assert(r.last._3 == 0L, s"final n_open = ${r.last._3}")
    // occupancy is a count of live intervals: never negative, sometimes busy
    assert(r.forall(_._3 >= 0L))
    assert(r.map(_._3).max > 0L)
    // running sum really is the prefix sum of net
    assert(r.map(_._2).sum == 0L)
    assert(r.scanLeft(0L)(_ + _._2).drop(1).zip(r.map(_._3)).forall {
      case (acc, open) => acc == open
    })
  }

  test("q24: peak concurrency matches a brute-force day-expansion count") {
    val li = Tables.lineitem(spark, sfDir).groupBy("l_orderkey")
      .agg(max(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")).as("ls"))
    val iv = Tables.orders(spark, sfDir)
      .withColumn("od", expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select("od", "ls").as[(Long, Long)].collect()
    val sweep = SurfaceR8b.q24OpenOrders(spark, sfDir)
      .agg(max("n_open")).as[Long].head()
    // brute force: count overlaps at every open day (small at sf0.001)
    val peak = iv.map(_._1).distinct
      .map(d => iv.count { case (od, ls) => od <= d && d <= math.max(od, ls) }).max
    assert(sweep == peak, s"sweep=$sweep brute=$peak")
  }

  // ---- Q25: Markov transitions ----

  test("q25: per-src probabilities sum to ~1 and counts cover all steps") {
    val r = SurfaceR8b.q25Markov(spark, sfDir)
    val sums = r.groupBy("src").agg(sum("p").as("sp"), sum("n").as("sn"))
      .as[(String, Double, Long)].collect()
    assert(sums.nonEmpty)
    // p is r4-rounded, so the sum is 1 within #dst * 0.5e-4
    assert(sums.forall { case (_, sp, _) => math.abs(sp - 1.0) < 1e-3 })
    val total = r.agg(sum("n")).as[Long].head()
    val e = Tables.events(spark, sfDir)
    val expected = e.count() - e.select("user_id").distinct().count()
    assert(total == expected, s"transitions $total != events-users $expected")
  }

  // ---- LT9: rolling z-score ----

  test("lt9: flags are reproducible and genuinely extreme") {
    val r = SurfaceR8b.lt9RollingZscore(spark, sfDir)
    val rows = r.as[(Long, String, Double, Double)].collect()
    // the fixture has heavy-ish tails: some anomalies, far from everything
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, _, z) => math.abs(z) > 3.0 })
    // deterministic: a second run produces the identical flag set
    val again = SurfaceR8b.lt9RollingZscore(spark, sfDir)
      .as[(Long, String, Double, Double)].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("lt9: a planted spike after a flat run-up is flagged with the exact z") {
    // 20 quiet points then a spike, one event_type, distinct timestamps
    val base = (1 to 20).map(i => (i.toLong, "t", 10.0 + (i % 2) * 0.2, i.toLong))
    val spike = Seq((21L, "t", 99.0, 21L))
    // Tables.events expects raw int64 nanos (driver parquet layout)
    (base ++ spike).toDF("event_id", "event_type", "value", "tu")
      .withColumn("ts", col("tu") * 1000000000L)
      .drop("tu")
      .write.mode("overwrite")
      .parquet("target/tmp/lt9_events/events.parquet")
    val got = SurfaceR8b.lt9RollingZscore(spark, "target/tmp/lt9_events")
      .as[(Long, String, Double, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(21L), s"flagged ${got.toSeq}")
    // exact z from the integer-moment formula: q=1e4-scaled values
    val qs = base.map(t => math.floor(t._3 * 1e4 + 0.5).toLong)
    val s = qs.sum; val ss = qs.map(q => q * q).sum
    val d = 20L * ss - s * s
    val z = (20L * 990000L - s).toDouble / (20.0 * math.sqrt(d.toDouble / 380.0))
    val zr = math.floor(z * 1e4 + 0.5) / 1e4
    assert(got.head._4 == zr, s"${got.head._4} != $zr")
  }

  // ---- LP25: mix drift ----

  test("lp25: JS terms are non-negative, bounded, and halves partition the corpus") {
    val r = SurfaceR8b.lp25MixDrift(spark, sfDir)
    val rows = r.select("lang", "na", "nb", "js_term")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // per-lang JS contribution is >= 0 (log-sum inequality), total <= ln 2
    assert(rows.forall(_._4 >= 0.0))
    assert(rows.map(_._4).sum <= math.log(2.0) + 1e-6)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(r => r._2 + r._3).sum == nDocs)
  }
}
