package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Relational

/** Physical-plan shape assertions (SURVEY.md §4.3): the properties that
  * decide whether a plan survives a 100x scale-up — filter/projection
  * pushdown to the parquet scan, broadcast vs shuffle join selection,
  * whole-stage codegen coverage, top-k fusion.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: shipdate filter and column pruning reach the parquet scan") {
    val plan = planOf(Relational.q1ScanAgg(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$plan")
    // pruned read schema: no orderkey/partkey/suppkey columns
    assert(plan.contains("ReadSchema") && !plan.contains("l_partkey"),
      s"columns not pruned:\n$plan")
  }

  test("q2: dim join broadcasts, fact-fact join shuffles") {
    val plan = planOf(Relational.q2Join3(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("q7: sort+limit fuses into TakeOrderedAndProject (no global sort)") {
    val plan = planOf(Relational.q7SortLimit(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k fusion:\n$plan")
  }

  test("q9: cosine filter fuses into the join condition (no pair materialisation)") {
    val plan = planOf(Relational.q9CosineSelfjoin(spark, sfDir))
    // the selective cosine predicate must sit INSIDE the nested-loop join
    // condition — evaluated via generated predicate code per pair — so the
    // 4M-pair cross product is never materialised into a row buffer
    assert(plan.contains("BroadcastNestedLoopJoin"), s"no BNLJ:\n$plan")
    val joinLine = plan.linesIterator.find(_.contains("BroadcastNestedLoopJoin")).get
    // CosineNormRewrite replaces cosine_sim in the condition with
    // dot_product over pre-projected per-row norms — the similarity
    // predicate must still sit INSIDE the join condition either way
    assert(joinLine.contains("dot_product") || joinLine.contains("cosine_sim"),
      s"kernel not in join condition:\n$plan")
    assert(plan.contains("_graft_norm"), s"norms not hoisted below the join:\n$plan")
    // doGenCode correctness itself is covered by VectorKernelsSpec's
    // interpreted-vs-codegen parity test
  }

  test("aggregates are two-phase (partial + final HashAggregate)") {
    val plan = planOf(Relational.q1ScanAgg(spark, sfDir))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial aggregation:\n$plan")
  }

  test("d1: decimal aggregation is two-phase with a 4-column pruned scan") {
    val plan = planOf(graft.queries.Hardening.queries("d1_decimal_agg")(spark, sfDir))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"decimal agg not two-phase:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("l_shipdate"),
      s"columns not pruned:\n$plan")
  }

  test("w8: distribution functions plan one exchange + one window") {
    val plan = planOf(graft.queries.WindowsFuncs.queries("w8_dist_funcs")(spark, sfDir))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one hash exchange:\n$plan")
    assert("\\bWindow\\b".r.findAllIn(plan).size >= 1, s"no window operator:\n$plan")
  }

  test("semi/anti joins plan as join operators, not subquery re-scans") {
    val anti = planOf(Relational.q4AntiJoin(spark, sfDir))
    assert(anti.contains("LeftAnti"), s"no anti join:\n$anti")
    val semi = planOf(Relational.j4SemiJoin(spark, sfDir))
    assert(semi.contains("LeftSemi"), s"no semi join:\n$semi")
  }

  test("join hints steer the physical strategy (SHUFFLE_HASH vs MERGE)") {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val shj = li.hint("shuffle_hash")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
    assert(planOf(shj).contains("ShuffledHashJoin"),
      s"SHUFFLE_HASH hint ignored:\n${planOf(shj)}")
    val smj = li.hint("merge")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
    assert(planOf(smj).contains("SortMergeJoin"),
      s"MERGE hint ignored:\n${planOf(smj)}")
  }

  test("cached frame re-reads from InMemoryRelation, not the file scan") {
    val agg = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    agg.cache()
    try {
      agg.count() // materialise
      val second = agg.where(col("n") > 0)
      assert(planOf(second).contains("InMemoryTableScan"),
        s"cache not used:\n${planOf(second)}")
    } finally agg.unpersist()
  }

  test("x5: top-k aggregate is two-phase — partial heaps before the shuffle") {
    val plan = planOf(graft.queries.Hardening.x5TopkAgg(spark, sfDir))
    // TypedImperativeAggregate plans as ObjectHashAggregate; a partial +
    // final pair proves each map task ships at most k entries per key
    // instead of every row (the point of the operator at scale)
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial top-k aggregation:\n$plan")
    assert(plan.contains("partial_top_k_by_score"),
      s"partial phase missing:\n$plan")
  }

  test("q12: ANALYZE stats feed the CBO — row counts on every join, reorder active") {
    Relational.prepareCboTables(spark, sfDir)
    val qe = spark.sql(Relational.cboJoin5Sql).queryExecution
    val joins = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    // with cbo.enabled + ANALYZE'd tables, BasicStatsPlanVisitor derives a
    // rowCount for every join node; without stats rowCount is None — this
    // is exactly the signal CostBasedJoinReorder orders by
    assert(joins.nonEmpty && joins.forall(_.stats.rowCount.isDefined),
      s"CBO stats missing on joins:\n${qe.optimizedPlan}")
    // and the stats-fed reorder must actually change the join tree: the
    // declared order starts from customer⋈orders; compare leaf order
    // against the rule-only plan
    val cboLeaves = qe.optimizedPlan.collectLeaves().map(_.toString)
    spark.conf.set("spark.sql.cbo.enabled", "false")
    val ruleLeaves = try spark.sql(Relational.cboJoin5Sql)
      .queryExecution.optimizedPlan.collectLeaves().map(_.toString)
    finally spark.conf.set("spark.sql.cbo.enabled", "true")
    assert(cboLeaves != ruleLeaves,
      s"join order unchanged by CBO:\ncbo=$cboLeaves\nrule=$ruleLeaves")
  }

  test("s6: partition-column predicate prunes directories (PartitionFilters, no data filter)") {
    // write the partitioned layout, then check the pruned readback plan
    graft.queries.Hardening.s6PartitionedSink(spark, sfDir).count()
    val out = new java.io.File("target/tmp/s6_sink").getAbsolutePath
    val pruned = spark.read.parquet(out)
      .where(col("o_orderpriority") === "1-URGENT")
    val plan = planOf(pruned)
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderpriority"),
      s"partition filter not applied at scan:\n$plan")
    // the predicate must NOT degrade into a post-scan row filter
    assert(!plan.contains("PushedFilters: [IsNotNull(o_orderpriority)"),
      s"partition predicate leaked into data filters:\n$plan")
  }

  test("q16: dim filter prunes fact partitions at runtime (dynamicpruning)") {
    val plan = planOf(graft.queries.SurfaceR5b.q16Dpp(spark, sfDir))
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the fact scan:\n$plan")
  }

  test("q16: DPP reads only the surviving partitions' files at runtime") {
    val df = graft.queries.SurfaceR5b.q16Dpp(spark, sfDir)
    df.collect() // execute so scan metrics are populated
    // AQE wraps every stage (result stage included, Spark 4.x) in
    // QueryStageExec nodes with no children — descend explicitly
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Seq(f)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case other => other.children.flatMap(scans)
    }
    val fact = scans(df.queryExecution.executedPlan)
      .filter(_.metadata("Location").contains("q16_fact")).head
    val readFiles = fact.metrics("numFiles").value
    val allFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File("target/tmp/q16_fact"))
        .count(_.getName.endsWith(".parquet"))
    }
    assert(readFiles > 0 && readFiles < allFiles,
      s"DPP did not skip files: read $readFiles of $allFiles")
  }

  test("j10: SHUFFLE_HASH hint selects ShuffledHashJoin (no sort phases)") {
    val plan = planOf(graft.queries.SurfaceR5b.j10ShuffleHashHint(spark, sfDir))
    assert(plan.contains("ShuffledHashJoin"), s"hint not honoured:\n$plan")
  }

  test("q3: top-k per group plans a two-phase WindowGroupLimit (partial before shuffle)") {
    // Spark 4's WindowGroupLimit prunes each group to k rows BEFORE the
    // rank window — and the Partial phase runs map-side, so only ≤k rows
    // per group per mapper ever cross the shuffle. This is the property
    // that keeps top-k-per-group viable at 100 TB; pin it so a filter
    // rewrite can't silently lose it.
    val df = graft.queries.Relational.q3WindowTopk(spark, sfDir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"missing two-phase WindowGroupLimit:\n$plan")
  }

  test("Windows.bounded partition key survives optimization (warning stays armed)") {
    // lit(0) would be folded out of the partition spec by Catalyst,
    // re-arming WindowExec's "No Partition Defined" warning; the
    // non-foldable BoundedPartitionKey must reach the physical plan.
    import org.apache.spark.sql.execution.window.WindowExec
    val df = spark.range(100).toDF("x")
      .withColumn("s", org.apache.spark.sql.functions.sum("x")
        .over(graft.Windows.bounded(org.apache.spark.sql.functions.col("x"))))
    df.count()
    def flat(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(flat)) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          flat(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          flat(q.plan)
        case _ => Nil
      })
    val windows = flat(df.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"bounded partition key was optimized away:\n$w")
    }
  }

  test("registry-wide: no bare global-order window anywhere in src/main") {
    // WindowExec's "No Partition Defined" warning is the scale tripwire;
    // it stays meaningful only if NO query ships one. Bounded relations
    // (#days, #bins, numPartitions offsets) must go through
    // graft.Windows.bounded; data-scaling ordinals through
    // GlobalRowId/PrefixSum. This lint keeps a bare Window.orderBy from
    // ever landing again — the plan-level twin (windows consume
    // aggregate-derived input) is SurfaceR8kSpec's audit.
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".scala")) Seq(f) else Nil
    // Multiline regex: catches `Window\n  .orderBy(` wrapped calls too,
    // not just the single-line literal.
    val bare = """(?s)Window\s*\.\s*orderBy\s*\(""".r
    val offenders = walk(new java.io.File("src/main/scala")).flatMap { f =>
      val src = new String(
        java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      // Strip comments so doc examples don't trip the lint; then flag
      // every match with its line number.
      val noBlock = """(?s)/\*.*?\*/""".r
        .replaceAllIn(src, m => "\n" * m.matched.count(_ == '\n'))
      val stripped = noBlock.linesIterator.map { l =>
          val c = l.indexOf("//"); if (c >= 0) l.substring(0, c) else l
        }.mkString("\n")
      bare.findAllMatchIn(stripped).map { m =>
        val line = stripped.substring(0, m.start).count(_ == '\n') + 1
        s"${f.getPath}:$line"
      }.toSeq
    }
    assert(offenders.isEmpty,
      s"bare global-order windows found:\n${offenders.mkString("\n")}")
  }
}
