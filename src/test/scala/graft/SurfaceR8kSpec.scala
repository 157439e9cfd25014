package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.queries.{SurfaceR8b, SurfaceR8e, SurfaceR8g, SurfaceR8k}

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

  test("t19: dynamic-gap sessions match a furthest-end-chain replay") {
    val got = SurfaceR8k.t19DynamicGapSession(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)").as("tu"),
        col("event_type")).as[(Long, Long, String)].collect()
    assert(got.map(_._2).sum == events.length)
    // replay one user with the merge rule: new session when tu reaches
    // the running max of previous (tu + gap)
    val uid = got.head._1
    val mine = events.filter(_._1 == uid).sortBy(_._2)
    var maxEnd = Long.MinValue
    val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    mine.foreach { case (_, tu, et) =>
      val gap = if (et == "error") 21600000000L else 43200000000L
      if (tu >= maxEnd) sessions += ((1L, tu, tu))
      else {
        val (n, s0, _) = sessions.last
        sessions(sessions.length - 1) = (n + 1, s0, tu)
      }
      maxEnd = math.max(maxEnd, tu + gap)
    }
    val want = sessions.map { case (n, s0, e0) => (uid, n, s0, e0) }.toSeq
    assert(got.filter(_._1 == uid).toSeq == want)
  }

  test("sequence analytics plans: windows run over aggregates, not facts") {
    // the 100x discipline: q24/q27/q28's running sums must consume an
    // aggregated relation (#days/#parts), never the fact table
    def flat(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(flat)) ++ (p match {
        case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
        case _ => Nil
      })
    def isAgg(p: SparkPlan) = p.isInstanceOf[HashAggregateExec] ||
      p.isInstanceOf[ObjectHashAggregateExec] || p.isInstanceOf[SortAggregateExec]
    // PrefixSum/GlobalRowId pin their (already-aggregated) input with an
    // eager localCheckpoint, which truncates lineage — the window's child
    // then reads a checkpointed RDD scan, not the agg that produced it.
    // Such a scan is an aggregate-derived relation for this check.
    def isBoundedSrc(p: SparkPlan) = isAgg(p) ||
      p.isInstanceOf[org.apache.spark.sql.execution.RDDScanExec]
    Seq(
      SurfaceR8b.q24OpenOrders(spark, sfDir),
      SurfaceR8e.q27AbcPareto(spark, sfDir),
      SurfaceR8g.q28CumulativeReach(spark, sfDir),
      graft.queries.SurfaceR8l.m34GainsTable(spark, sfDir),
      graft.queries.SurfaceR8n.q32WowGrowth(spark, sfDir),
      SurfaceR8k.lp29MixtureWaterfill(spark, sfDir)).foreach { df =>
      df.count() // force AQE to finalize the plan
      val windows = flat(df.queryExecution.executedPlan)
        .collect { case w: WindowExec => w }
      assert(windows.nonEmpty, "expected a window in the plan")
      windows.foreach { w =>
        assert(flat(w.child).exists(isBoundedSrc),
          s"window consumes un-aggregated input:\n$w")
      }
    }
  }
}
