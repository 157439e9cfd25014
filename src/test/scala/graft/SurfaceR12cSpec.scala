package graft

import org.apache.spark.sql.functions._

/** Laws for round-12 batch 3: the KN perplexity filter and the
  * event-sequence regex. */
class SurfaceR12cSpec extends SparkSpec {

  test("lt79: log-probabilities are negative and the gate agrees with the mean") {
    val out = queries.SurfaceR12c.lt79DocLogprob(spark, sfDir).cache()
    assert(out.count() > 0)
    // bigram probabilities are < 1, so every mean log-prob is negative
    assert(out.where(col("avg_logprob") >= 0).count() === 0)
    // keep flag is exactly the -8 nats gate on the reported mean
    // (compare against the rounded readout with an epsilon wider than
    // the r4 grid so the quantized-integer gate and the rounded column
    // can never disagree spuriously)
    val bad = out.where(
      (col("keep") && col("avg_logprob") < -8.0001) ||
        (!col("keep") && col("avg_logprob") > -7.9999))
    assert(bad.count() === 0)
    out.unpersist()
  }

  test("lt79: only multi-token docs are scored") {
    val out = queries.SurfaceR12c.lt79DocLogprob(spark, sfDir)
    val multi = Tables.documents(spark, sfDir)
      .where(size(filter(split(col("text"), " "), t => length(t) > 0)) >= 2)
      .count()
    assert(out.count() === multi)
  }

  test("lt80: funnel counts are bounded by min(views, purchases)") {
    val out = queries.SurfaceR12c.lt80EventRegex(spark, sfDir)
    val counts = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("nv"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("ne"))
    val j = out.join(counts, "user_id")
    assert(j.where(col("n_direct_funnels") > least(col("nv"), col("np"))).count() === 0)
    assert(j.where(col("max_error_run") > col("ne")).count() === 0)
    assert(out.agg(sum("n_direct_funnels")).collect()(0).getLong(0) > 0)
  }

  test("lt80: regex semantics on a hand sequence") {
    // v[^vp]*p: leftmost non-overlapping — "vcspvevp" has matches
    // "vcsp" and "vevp"? no: second v at index 4, then 'e' then 'v' is
    // excluded by the class — match restarts at the LAST v before p.
    // Java regex on "vcspvevp": first match "vcsp"; remainder "vevp":
    // 'v' then 'e' ok, then 'v' breaks the class; next attempt from
    // index 6 'v' then 'p' matches "vp". So 2 matches.
    val df = spark.sql(
      "SELECT size(regexp_extract_all('vcspvevp', 'v[^vp]*p', 0)) AS n," +
        " array_max(transform(regexp_extract_all('veeepee', 'e+', 0)," +
        " x -> length(x))) AS run")
    val r = df.collect()(0)
    assert(r.getInt(0) === 2)
    assert(r.getInt(1) === 3)
  }
}
