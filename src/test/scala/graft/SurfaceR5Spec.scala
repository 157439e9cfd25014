package graft

import org.apache.spark.sql.functions._

import graft.queries.SurfaceR5

/** Round-5 surface queries: semantics + plan-shape assertions, plus the
  * runtime bloom-filter probe (the 100 TB join-pruning path).
  */
class SurfaceR5Spec extends SparkSpec {
  import spark.implicits._

  test("a15: width_bucket agrees with the portable floor binning") {
    // the oracle dialect lacks width_bucket, so the query bins with
    // floor(v/w); assert the built-in width_bucket is the same partition
    // (offset by 1) over the in-range domain.
    val diff = Tables.orders(spark, sfDir)
      .select(
        floor(col("o_totalprice") / 25000.0).as("f"),
        expr("width_bucket(o_totalprice, 0.0, 600000.0, 24)").as("wb"))
      .where(col("o_totalprice") >= 0 && col("o_totalprice") < 600000.0)
      .where(col("wb") =!= col("f") + 1)
      .count()
    assert(diff == 0, "width_bucket and floor binning disagree in-range")
  }

  test("a18: crosstab pivot column set is exactly the oracle's") {
    // crosstab derives pivot columns from observed distinct values, while
    // the oracle hard-codes FILTER columns "F" and "O"; pin the column
    // set so a fixture/linestatus change desynchronizes HERE with a named
    // failure instead of as an opaque driver hash mismatch.
    val cols = graft.queries.SurfaceR5b.a18Crosstab(spark, sfDir).columns.toSet
    assert(cols == Set("l_returnflag_l_linestatus", "F", "O"),
      s"crosstab columns $cols drifted from the hard-coded oracle set")
  }

  test("a14: deterministic mode is stable under repartitioning") {
    val base = SurfaceR5.a14Mode(spark, sfDir).collect().toSeq
    val li = Tables.lineitem(spark, sfDir).repartition(13, col("l_orderkey"))
    li.createOrReplaceTempView("graft_a14_t")
    val re = spark.sql(
      """SELECT l_returnflag, mode(l_quantity, true) AS mode_qty,
        |count(*) AS n_rows FROM graft_a14_t
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin).collect().toSeq
    assert(base == re, "mode(x, true) changed under repartitioning")
  }

  test("t10: spine has no gaps and zero-fills missing cells") {
    val rows = SurfaceR5.t10GapFill(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = rows.groupBy(_._1)
    // every type spans the same complete hourly grid
    val grids = byType.values.map(_.map(_._2).toSeq.sorted).toSeq
    assert(grids.toSet.size == 1, "types disagree on the spine")
    val g = grids.head
    assert(g.zip(g.tail).forall { case (a, b) => b - a == 3600 },
      "spine has gaps or non-hourly steps")
    // gap filling must actually fill something, with zeros
    assert(rows.exists(_._3 == 0L), "no zero-filled cell — vacuous fixture")
    // totals match the raw event count
    val total = rows.map(_._3).sum
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("q14: lateral stats match a groupBy on the same subset") {
    val lat = SurfaceR5.q14LateralJoin(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val agg = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir).where(col("o_orderkey") % 50 === 0),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    agg.foreach { case (k, n) => assert(lat.get(k).contains(n), s"order $k") }
    // orders with zero lineitems still appear (count 0)
    assert(lat.keySet.size >= agg.keySet.size)
  }

  test("a16: unioned HLL sketches estimate within 5% of exact distinct") {
    val rows = queries.SurfaceR5.a16HllUnion(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_._1).toSet == exact.keySet)
    rows.foreach { case (k, e, ok) =>
      assert(e == exact(k), s"$k: exact_parts $e vs recount ${exact(k)}")
      assert(ok, s"$k: sketch-union estimate breaks the 5% envelope")
    }
  }

  test("a20: count-min estimates are one-sided and within eps*N of exact") {
    val rows = queries.SurfaceR5b.a20Countmin(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (seg, _, ok) =>
      assert(ok, s"$seg: CMS error law (one-sided, ≤ eps*N overshoot) broken")
    }
  }

  test("a17: reaggregated partials equal the direct average") {
    val reagg = queries.SurfaceR5.a17PartialReagg(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(Orc.r4(avg("l_quantity")).as("a"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(reagg.keySet == direct.keySet)
    direct.foreach { case (k, (a, n)) =>
      assert(reagg(k)._2 == n, s"$k count")
      // sum/count vs streaming avg: same value to well past 4 decimals
      assert(math.abs(reagg(k)._1 - a) < 1e-9, s"$k avg ${reagg(k)._1} vs $a")
    }
  }

  test("lp7: profiler matches per-column ground truth") {
    val prof = queries.SurfaceR5.lp7Profile(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("text", "lang", "source"))
    val nLang = Tables.documents(spark, sfDir)
      .select("lang").distinct().count()
    assert(prof("lang").getLong(2) == nLang)
    assert(prof("text").getLong(1) == Tables.documents(spark, sfDir).count())
  }

  test("t11: streaming session windows equal the batch session windows") {
    val stream = queries.StreamingQueries.t11StreamSession(spark, sfDir).collect().toSeq
    val batch = queries.TimeJson.t3SessionWindow(spark, sfDir).collect().toSeq
    assert(stream == batch, s"stream=${stream.take(3)} batch=${batch.take(3)}")
  }

  test("q14 plan: lateral subquery decorrelates to a join (no BNLJ)") {
    val p = plan(queries.SurfaceR5.q14LateralJoin(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin"), s"per-row loop:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
  }

  test("observe: pipeline metrics collected without a second scan") {
    val obs = new org.apache.spark.sql.Observation("graft_obs")
    val df = Tables.lineitem(spark, sfDir)
      .observe(obs, count(lit(1)).as("n_rows"), sum("l_quantity").as("qty"))
      .where(col("l_discount") > 0.05)
    val filtered = df.count()
    val metrics = obs.get
    val total = metrics("n_rows").asInstanceOf[Long]
    assert(total > filtered, "observe should see pre-filter rows")
    assert(total == Tables.lineitem(spark, sfDir).count())
    assert(metrics("qty").asInstanceOf[Double] > 0)
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    val s = spark
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> s.conf.getOption(k)).toMap
    try {
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // 90% of the left rows share one key — the classic hot-key shape
      val left = s.range(0, 200000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 0L ELSE id END AS k",
        "id AS payload")
      val right = s.range(0, 1000).selectExpr("id AS k", "id * 2 AS rv")
      val j = left.join(right, "k").groupBy().count()
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the big side of a selective join") {
    val s = spark
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        s.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        s.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        s.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    try {
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: runtime filters don't apply under broadcast
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = Tables.lineitem(s, sfDir)
      val o = Tables.orders(s, sfDir).where(col("o_orderpriority") === "1-URGENT")
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}
