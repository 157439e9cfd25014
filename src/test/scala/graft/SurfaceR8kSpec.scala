package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR8k

class SurfaceR8kSpec extends SparkSpec {
  import spark.implicits._

  test("lp29: allocation closes the budget exactly with a cap/level dichotomy") {
    val r = SurfaceR8k.lp29MixtureWaterfill(spark, sfDir)
      .as[(String, Long, Long)].collect()
    assert(r.nonEmpty)
    val totalTokens = Tables.documents(spark, sfDir)
      .agg(sum(size(split(col("text"), " ")).cast("long"))).as[Long].head()
    val budget = totalTokens / 2
    // exact closure
    assert(r.map(_._3).sum == budget, s"sum=${r.map(_._3).sum} b=$budget")
    // never over-allocate a source
    assert(r.forall { case (_, n, a) => a <= n && a >= 0 })
    // waterline shape: uncapped sources keep everything; capped sources
    // sit within 1 of a common level
    val capped = r.filter { case (_, n, a) => a < n }
    if (capped.nonEmpty) {
      val levels = capped.map(_._3)
      assert(levels.max - levels.min <= 1, s"levels ${levels.toSet}")
      // every fully-kept source is no bigger than the level band
      val uncapped = r.filter { case (_, n, a) => a == n }
      assert(uncapped.forall(_._2 <= levels.max))
    }
  }
}
