package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR10ay

class SurfaceR10aySpec extends SparkSpec {

  test("every R10ay query runs at sf0.001") {
    SurfaceR10ay.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("m137: the LLR walk, boundaries, and decision match a driver-side replay") {
    val daily = Tables.events(spark, sfDir)
      .select(expr("CAST(floor(unix_micros(ts) / 86400000000) AS BIGINT)").as("day"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy("day").agg(count(lit(1)).as("n"), sum("y").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val a = math.log(0.22 / 0.20); val b = math.log(0.78 / 0.80)
    val hi = math.log(0.8 / 0.05); val lo = math.log(0.2 / 0.95)
    var llr = 0.0; var hiDay = -1L; var loDay = -1L
    daily.foreach { case (day, n, x) =>
      llr += x * a + (n - x) * b
      if (hiDay < 0 && llr >= hi) hiDay = day
      if (loDay < 0 && llr <= lo) loDay = day
    }
    val r = SurfaceR10ay.m137Sprt(spark, sfDir).collect().head
    assert(r.getLong(0) == daily.length)
    assert(math.abs(r.getDouble(1) - hi) < 1e-3)
    assert(math.abs(r.getDouble(2) - lo) < 1e-3)
    assert(math.abs(r.getDouble(3) - llr) < math.abs(llr) * 1e-3 + 1e-2,
      s"final LLR ${r.getDouble(3)} vs $llr")
    assert(r.getLong(4) == hiDay, s"first_hi_day ${r.getLong(4)} vs $hiDay")
    assert(r.getLong(5) == loDay, s"first_lo_day ${r.getLong(5)} vs $loDay")
    val want =
      if (hiDay >= 0 && (loDay < 0 || hiDay <= loDay)) "accept_h1"
      else if (loDay >= 0) "accept_h0" else "continue"
    assert(r.getString(6) == want)
  }

  test("lt40: per-source perplexity matches an add-1 LM replay") {
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val vocab = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val tot = toks.length.toDouble; val v = vocab.size.toDouble
    val bySource = toks.groupBy(_._1)
    val rows = SurfaceR10ay.lt40SourcePerplexity(spark, sfDir).collect()
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val ts = bySource(r.getString(0)).map(_._2)
      val nll = ts.map(t => math.log(tot + v) - math.log(vocab(t) + 1.0)).sum
      val mean = nll / ts.length
      assert(r.getLong(1) == ts.length)
      assert(math.abs(r.getDouble(2) - mean) < 1e-3, s"nll for ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - math.exp(mean)) <
        math.exp(mean) * 1e-3 + 1e-3, s"PP for ${r.getString(0)}")
    }
  }
}
