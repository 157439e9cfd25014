package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.SurfaceR8c

class SurfaceR8cSpec extends SparkSpec {
  import spark.implicits._

  // ---- LT10: BPE pair stats ----

  test("lt10: top pair matches a driver-side recount of the raw text") {
    val got = SurfaceR8c.lt10BpePairs(spark, sfDir)
      .as[(String, Long)].collect()
    assert(got.length == 20)
    // recount in plain Scala from the raw corpus
    val texts = Tables.documents(spark, sfDir)
      .select("text").as[String].collect()
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val w = t.split(" ", -1)
      if (w.length >= 2)
        w.sliding(2).foreach { p =>
          val k = p(0) + " " + p(1)
          counts(k) = counts.getOrElse(k, 0L) + 1L
        }
    }
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq == want, s"got ${got.take(3).toSeq} want ${want.take(3)}")
  }

  // ---- Q26: sessionization ----

  test("q26: sessions partition each user's events and respect the gap") {
    val r = SurfaceR8c.q26Sessionize(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(r.nonEmpty)
    val e = Tables.events(spark, sfDir)
    assert(r.map(_._3).sum == e.count())
    // session ids are 1..k per user, dense
    r.groupBy(_._1).foreach { case (_, ss) =>
      assert(ss.map(_._2).sorted.toSeq == (1L to ss.length).toSeq)
    }
    // per user: consecutive sessions are separated by more than the gap
    r.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 - a._5 > 43200000000L,
          s"sessions ${a._2},${b._2} closer than the 12h gap")
        case _ =>
      }
    }
    // durations are consistent
    assert(r.forall(s => s._6 == s._5 - s._4 && s._6 >= 0))
  }

  // ---- A30: equi-depth histogram ----

  test("a30: buckets are ntile-identical, contiguous, and balanced") {
    val got = SurfaceR8c.a30EquidepthHist(spark, sfDir)
      .as[(Long, Long, Double, Double)].collect()
    assert(got.map(_._1).toSeq == (1L to 10L).toSeq)
    val n = Tables.lineitem(spark, sfDir).count()
    assert(got.map(_._2).sum == n)
    // ntile balance: sizes differ by at most one, big buckets first
    val sizes = got.map(_._2)
    assert(sizes.max - sizes.min <= 1)
    assert(sizes.sorted.reverse.toSeq == sizes.toSeq)
    // contiguous, ordered ranges
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._4 <= b._3)
      case _ =>
    }
    // cell-identical to the single-partition ntile it replaces
    val want = Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice").as("p"), col("l_orderkey"), col("l_linenumber"))
      .withColumn("bucket", ntile(10).over(
        Window.orderBy("p", "l_orderkey", "l_linenumber")).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("p").as("lo"), max("p").as("hi"))
      .orderBy("bucket")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.toSeq == want.toSeq)
  }

  // ---- LJ2: prefix-filtered Jaccard ----

  test("lj2: equals brute-force all-pairs Jaccard at threshold 0.95") {
    val got = SurfaceR8c.lj2PrefixJaccard(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1).filter(_.nonEmpty).toSet }
    val want = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      i = (ta & tb).size
      j = i.toDouble / (ta.size + tb.size - i).toDouble
      if j >= 0.95
    } yield (a, b, math.floor(j * 1e4 + 0.5) / 1e4))
      .sortBy(p => (p._1, p._2))
    assert(got.toSeq == want.toSeq,
      s"got ${got.length} pairs, want ${want.length}")
  }

  test("lj2 plan: candidate generation is an equi-join, never a cross product") {
    val plan = SurfaceR8c.lj2PrefixJaccard(spark, sfDir).queryExecution.executedPlan
    def flat(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(flat)) ++
        (p match { case a: AdaptiveSparkPlanExec => flat(a.executedPlan); case _ => Nil })
    val all = flat(plan)
    assert(!all.exists(_.isInstanceOf[CartesianProductExec]))
    assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
  }
}
