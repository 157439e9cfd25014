package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graft.JaroWinkler

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro_winkler matches DuckDB's jaro_winkler_similarity cell-for-cell") {
    // expected values computed by the oracle engine itself
    // (duckdb jaro_winkler_similarity) — the expression must agree on the
    // exact doubles, not merely approximately, or the lf3 oracle would
    // drift at the 8th decimal
    val vectors = Seq(
      ("MARTHA", "MARHTA") -> 0.9611111111111111, // 2 transposed chars, prefix 3
      ("DWAYNE", "DUANE") -> 0.8400000000000001, // prefix 1
      ("DIXON", "DICKSONX") -> 0.8133333333333332, // unequal lengths, prefix 2
      ("abc", "cba") -> 0.5555555555555555, // window 0: same-position only
      ("abcd", "badc") -> 0.8333333333333334, // all matched, 2 transpositions
      ("a", "") -> 0.0, // one side empty
      ("", "") -> 0.0, // both empty (DuckDB defines 0, not 1)
      ("a", "a") -> 1.0,
      ("ab", "ba") -> 0.0, // window 0, no same-position match
      ("CRANE", "TRACE") -> 0.7333333333333334, // above threshold, prefix 0
      ("abcdxxxx", "abcdyyyy") -> 0.6666666666666666, // jaro <= 0.7: NO boost despite prefix 4
      ("aromatic azure", "aromatic beige") -> 0.8857142857142858, // fixture-shaped
      ("JELLYFISH", "SMELLYFISH") -> 0.8962962962962964,
      ("foo bar", "foo baz") -> 0.9428571428571428,
      ("abcde", "edcba") -> 0.4666666666666666)
    vectors.foreach { case ((a, b), want) =>
      val got = jw(a, b)
      assert(got == want, s"jw('$a','$b') = $got, DuckDB says $want")
    }
    // symmetry on an asymmetric-length pair
    assert(jw("DIXON", "DICKSONX") == jw("DICKSONX", "DIXON"))
  }

  test("jaro_winkler evaluates identically via codegen SQL and interpreted eval") {
    val pairs = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
      ("aromatic azure", "aromatic beige"), ("", "x"), ("same", "same"))
    val viaSql = pairs.toDF("a", "b")
      .select(expr("jaro_winkler(a, b)").as("jw")).as[Double].collect()
    assert(viaSql.toSeq == pairs.map { case (a, b) => jw(a, b) })
    // null propagation
    val nulls = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(expr("jaro_winkler(a, b)")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("lf3: blocked jaro pairs are canonical, thresholded, and block-consistent") {
    val rows = graft.queries.SurfaceR8.lf3JaroPairs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, s) = (r.getString(0), r.getString(1), r.getDouble(2))
      assert(a < b, "pairs must be canonical")
      assert(s >= 0.8 && s <= 1.0)
      assert(a.split(" ").head == b.split(" ").head, "first-token blocking violated")
    }
  }

  test("m28: MAD fence flags the planted extremes and is outlier-robust") {
    val report = graft.queries.SurfaceR8.m28MadOutliers(spark, sfDir).collect()
    assert(report.nonEmpty)
    report.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) < r.getLong(1),
        "outliers must be a strict minority")
      assert(r.getDouble(4) >= 0.0, "mad must be non-negative")
    }
    // robustness: the median fence must not move when one extreme value
    // is made 100x more extreme (a mean/stddev fence would)
    val base = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).where(col("event_type") === "view")
    val med0 = base.agg(expr("percentile(value, 0.5D)")).head().getDouble(0)
    val mx = base.agg(max("value")).head().getDouble(0)
    val spiked = base.withColumn("value",
      when(col("value") === mx, lit(mx * 100)).otherwise(col("value")))
    val med1 = spiked.agg(expr("percentile(value, 0.5D)")).head().getDouble(0)
    assert(med0 == med1, "median moved under a single spiked extreme")
  }
}
