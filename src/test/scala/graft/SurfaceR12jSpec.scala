package graft

import org.apache.spark.sql.functions._

/** Laws for round-12 batch 10: file-roll census and Page–Hinkley. */
class SurfaceR12jSpec extends SparkSpec {

  test("s32: every file respects the roll limit and the census reconciles") {
    val out = queries.SurfaceR12j.s32MaxRecordsPerFile(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.where(col("max_fill") > 5000).count() === 0)
    // totals reconcile with the source per flag
    val ref = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(out.join(ref, "l_returnflag")
      .where(col("n_rows") =!= col("n")).count() === 0)
    // census arithmetic: n_files = ceil(n/5000)
    assert(out.where(col("n_files") =!= expr("(n_rows + 4999) div 5000"))
      .count() === 0)
    out.unpersist()
  }

  test("lt84: excursion is non-negative; alarm only when excursion crossed lambda") {
    val out = queries.SurfaceR12j.lt84PageHinkley(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.where(col("max_excursion") < 0).count() === 0)
    assert(out.where(col("alarmed") && col("max_excursion") <= 0.05)
      .count() === 0)
    assert(out.where(!col("alarmed") && col("max_excursion") > 0.05)
      .count() === 0)
    out.unpersist()
  }

  test("lt84: a level shift alarms, a flat series does not (hand fold)") {
    import spark.implicits._
    def run(qvs: Seq[Long]): (Long, Long) = {
      val df = qvs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("k0", "qv")
        .agg(sort_array(collect_list(struct(col("k0"), col("qv")))).as("sv"))
        .selectExpr("""aggregate(sv,
            named_struct('k', CAST(0 AS BIGINT), 's', CAST(0 AS BIGINT),
              'm', CAST(0 AS BIGINT), 'mmin', CAST(0 AS BIGINT),
              'exc', CAST(0 AS BIGINT), 'alarm', CAST(0 AS BIGINT)),
            (acc, x) -> named_struct(
              'k', acc.k + 1,
              's', acc.s + x.qv,
              'm', acc.m + CAST(floor(CAST((acc.k + 1) * x.qv - (acc.s + x.qv)
                     AS DOUBLE) / (acc.k + 1) - 5000 + 0.5) AS BIGINT),
              'mmin', least(acc.mmin,
                acc.m + CAST(floor(CAST((acc.k + 1) * x.qv - (acc.s + x.qv)
                  AS DOUBLE) / (acc.k + 1) - 5000 + 0.5) AS BIGINT)),
              'exc', greatest(acc.exc,
                acc.m + CAST(floor(CAST((acc.k + 1) * x.qv - (acc.s + x.qv)
                  AS DOUBLE) / (acc.k + 1) - 5000 + 0.5) AS BIGINT) - acc.mmin),
              'alarm', CASE WHEN acc.alarm > 0 THEN acc.alarm
                WHEN acc.m + CAST(floor(CAST((acc.k + 1) * x.qv - (acc.s + x.qv)
                  AS DOUBLE) / (acc.k + 1) - 5000 + 0.5) AS BIGINT) - acc.mmin
                  > 50000 THEN acc.k + 1
                ELSE CAST(0 AS BIGINT) END)) AS ph""")
        .selectExpr("ph.exc", "ph.alarm").collect()(0)
      (df.getLong(0), df.getLong(1))
    }
    // flat at 1.0 (1e6 on the grid): mean-deviation terms are all -δ
    val (excFlat, alarmFlat) = run(Seq.fill(20)(1000000L))
    assert(alarmFlat === 0L && excFlat === 0L)
    // level shift +1.0 halfway: deviations vs the dragging mean blow past λ
    val (excShift, alarmShift) =
      run(Seq.fill(10)(1000000L) ++ Seq.fill(10)(2000000L))
    assert(alarmShift > 10L, s"alarm at $alarmShift, excursion $excShift")
  }
}
