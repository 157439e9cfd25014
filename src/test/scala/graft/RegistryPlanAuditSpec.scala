package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, LocalTableScanExec, RDDScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.functions._

/** REGISTRY-WIDE plan gate: every SparkEntry.queries entry is planned at
  * sf0.001 and its physical plan audited for the three shapes that do
  * not survive a 100× scale-up:
  *
  *   1. a WindowExec with NO partition spec (Exchange SinglePartition
  *      funnel — bounded-relation windows must go through
  *      graft.Windows.bounded, data-scaling ordinals through
  *      GlobalRowId/PrefixSum);
  *   2. a CartesianProductExec (non-broadcast cross join);
  *   3. a BroadcastNestedLoopJoinExec whose build side is not visibly
  *      bounded (no aggregate / local / dimension-scan underneath);
  *   4. a ShuffleExchangeExec repartitioning a fact-table scan to a
  *      single partition (the `repartition(1)` shape the source lint
  *      cannot see).
  *
  * These are STATIC plan properties — the audit reads the pre-AQE
  * physical plan and does not execute the query, so the whole registry
  * sweeps in planning time (model-fit entries still pay their fit).
  * Deviations are not silently skipped: they go in the allowlists
  * below with a named justification, so the diff review sees every new
  * exception. A negative-control test proves each rule actually bites.
  */
class RegistryPlanAuditSpec extends SparkSpec {

  /** j6_cross_join IS the J6 contract row: an intentional bounded
    * cartesian (region × nation, 5 × 25 rows). m7's cartesian lives
    * inside MLlib's own `recommendForAllUsers` (ALSModel.recommendForAll
    * blocked-crossJoins the user/item FACTOR tables — the standard
    * dense-scoring design; block size caps each task's pair count). */
  private val cartesianAllowed = Set("j6_cross_join", "m7_als")

  /** Declared brute-force baselines whose BNLJ build side is the
    * corpus by design — each has a bucketed/blocked at-scale twin in
    * the registry (SURVEY §2.13): q9/q9b/l3 brute cosine and l4/l4b
    * brute top-k (bucketed twins l3b/l4c), j7 theta join (contract
    * row; band/binned twins j9/j9b). */
  private val bnljAllowed = Set(
    "q9_cosine_selfjoin", "q9b_cosine_selfjoin_t038", "l3_cosine_pairs",
    "l4_topk_neighbors", "l4b_topk_agg", "j7_theta_join")

  private val factFiles = Set("lineitem", "orders", "events",
    "documents", "embeddings", "customer", "part", "supplier")

  private def flat(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(flat)) ++ (p match {
      case a: AdaptiveSparkPlanExec => flat(a.executedPlan)
      case _ => Nil
    })

  private def isBoundedSrc(p: SparkPlan): Boolean = p match {
    case _: HashAggregateExec | _: ObjectHashAggregateExec |
         _: SortAggregateExec => true
    case _: LocalTableScanExec | _: RDDScanExec => true
    case _: org.apache.spark.sql.execution.RangeExec => true
    // an explicit row cap is a structural boundedness proof (the
    // l17/ls6 probe panels: .limit(N) duplicating the predicate's
    // bound, a content no-op the audit CAN verify)
    case _: org.apache.spark.sql.execution.GlobalLimitExec |
         _: org.apache.spark.sql.execution.CollectLimitExec => true
    // a REUSED exchange is a leaf pointer at another exchange in the
    // same plan: that original occurrence is audited where it appears,
    // so reuse itself proves nothing new (hit by lg13, which broadcasts
    // the same 1-row aggregates into several consumers)
    case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => true
    case f: FileSourceScanExec =>
      // dimension tables are bounded; fact scans are not
      !f.relation.location.rootPaths.exists(path =>
        factFiles.exists(t => path.toString.contains(s"$t.parquet")))
    case _ => false
  }

  private def scansFacts(p: SparkPlan): Boolean =
    flat(p).exists {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(path =>
          factFiles.exists(t => path.toString.contains(s"$t.parquet")))
      case _ => false
    }

  /** Returns the violations found in one plan (empty = clean). */
  private def audit(name: String, df: DataFrame): Seq[String] = {
    val nodes = flat(df.queryExecution.sparkPlan)
    val bare = nodes.collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        s"$name: WindowExec with no partition spec"
    }
    val cart = nodes.collect {
      case _: CartesianProductExec if !cartesianAllowed(name) =>
        s"$name: CartesianProduct"
    }
    val bnlj = nodes.collect {
      case j: BroadcastNestedLoopJoinExec if !bnljAllowed(name) =>
        val build = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
          case _ => j.right
        }
        if (!flat(build).exists(isBoundedSrc))
          Some(s"$name: BNLJ with unbounded build side")
        else None
    }.flatten
    val single = nodes.collect {
      case e: ShuffleExchangeExec
          if e.outputPartitioning == SinglePartition && scansFacts(e.child) =>
        s"$name: fact scan shuffled to a single partition"
    }
    bare ++ cart ++ bnlj ++ single
  }

  test("registry-wide: no scale-killer shapes in any entry's plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try audit(name, fn(spark, sfDir))
        catch { case e: Throwable =>
          Seq(s"$name: failed to plan: ${e.getMessage}")
        }
    }
    assert(offenders.isEmpty,
      s"scale-killer plan shapes:\n${offenders.mkString("\n")}")
  }

  test("negative control: the audit flags each banned shape") {
    val docs = Tables.documents(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    // 1. bare global-order window over a fact table
    val bad1 = docs.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("doc_id"))))
    assert(audit("ctl1", bad1).exists(_.contains("no partition spec")))
    // 2. non-broadcast cartesian (auto-broadcast off, else the small
    // sf0.001 side is broadcast and the plan becomes a BNLJ instead)
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bad2 = li.select(col("l_orderkey")).crossJoin(
        Tables.orders(spark, sfDir).select(col("o_orderkey")))
      assert(audit("ctl2", bad2).exists(_.contains("CartesianProduct")))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    // 3. BNLJ broadcasting a raw fact scan
    val bad3 = li.select(col("l_orderkey")).join(
      broadcast(Tables.orders(spark, sfDir).select(col("o_orderkey"))),
      col("l_orderkey") < col("o_orderkey"))
    assert(audit("ctl3", bad3).exists(_.contains("unbounded build side")))
    // 4. repartition(1) over a fact scan
    val bad4 = li.repartition(1).select(sum(col("l_quantity")))
    assert(audit("ctl4", bad4).exists(_.contains("single partition")))
  }
}
