package graft

import org.apache.spark.sql.functions._

/** Laws for round-12 batch 2: the processing-time trigger and the
  * Theil–Sen robust trend. */
class SurfaceR12bSpec extends SparkSpec {

  test("t25: processing-time stream snapshot equals the batch aggregate") {
    val streamed = queries.SurfaceR12b.t25ProcessingTime(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = Tables.documents(spark, sfDir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed === batch)
  }

  test("lt78: pair count is n*(n-1)/2 per series") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type").agg(count(lit(1)).as("n_days"))
    val out = queries.SurfaceR12b.lt78TheilSen(spark, sfDir)
    val joined = out.join(daily, "event_type")
      .where(col("n_pairs") =!= col("n_days") * (col("n_days") - 1) / 2)
    assert(joined.count() === 0)
  }

  test("lt78: median-of-slopes shrugs off one outlier day (robustness law)") {
    // synthetic: a clean slope-2 line with one wild outlier; OLS slope
    // moves far, the Theil-Sen median stays near 2. Replicates the
    // operator's slope formula over a hand-built qv series.
    import spark.implicits._
    // outlier at the END: a centered outlier's pairwise perturbations
    // cancel in the mean; at the boundary every pair touching it tilts
    // the same way, so the mean-of-slopes moves and the median doesn't
    val qv = (1 to 11).map(j =>
      (j.toLong, if (j == 11) 1000000000L else 2000000L * j)) // 1e-6 grid
    val idx = qv.toDF("j", "qv")
    val a = idx.toDF("ja", "qa")
    val b = idx.toDF("jb", "qb")
    val slopes = a.crossJoin(b).where(col("jb") > col("ja"))
      .select(((col("qb") - col("qa")).cast("double") /
        ((col("jb") - col("ja")) * lit(1000000.0))).as("slope"))
    val med = slopes.agg(expr("percentile(slope, 0.5D)")).collect()(0).getDouble(0)
    assert(math.abs(med - 2.0) < 0.5, s"Theil-Sen median $med strayed from 2.0")
    val ols = slopes.agg(avg("slope")).collect()(0).getDouble(0)
    assert(math.abs(ols - 2.0) > 5.0, "fixture not outlier-contaminated enough")
  }
}
