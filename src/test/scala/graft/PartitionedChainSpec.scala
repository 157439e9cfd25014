package graft

import org.apache.spark.sql.functions._

/** Laws for partitioned delta chains ([[graft.operators.DeltaChain]]
  * `create(partitionBy = ...)`): checkpoints are Hive-partitioned so a
  * filtered read prunes checkpoint files at planning time, while
  * deltas stay unpartitioned (small by contract; empty change records
  * must keep a readable footer; the streaming feed reads delta files
  * directly). The q71 oracle hash is the end-to-end authority; these
  * pin pruning, the whole-lifecycle interplay (cadence, optimize,
  * addColumn), and content identity with an unpartitioned twin.
  */
class PartitionedChainSpec extends SparkSpec {
  import operators.DeltaChain

  private def freshRoot(): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_pchain_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  private def mkChain(root: String): Unit = {
    import spark.implicits._
    val base = (1L to 900L).map(k => (k, k * 10, s"g${k % 3}"))
      .toDF("k", "v", "grp").repartition(3)
    DeltaChain.create(root, base, Seq("k"), checkpointEvery = 2,
      partitionBy = Seq("grp"))
    DeltaChain.commitDelta(spark, root,
      (1L to 900L).filter(_ % 7 == 0).map(k => (k, k * 10 + 1, s"g${k % 3}"))
        .toDF("k", "v", "grp"))                       // v2 delta
    DeltaChain.commitDelta(spark, root,
      (1L to 900L).filter(_ % 5 == 0).map(k => (k, k * 10 + 2, s"g${k % 3}"))
        .toDF("k", "v", "grp"))                       // v3 -> checkpoint due
  }

  private def expectV3: Map[Long, Long] =
    (1L to 900L).map { k =>
      k -> (if (k % 5 == 0) k * 10 + 2 else if (k % 7 == 0) k * 10 + 1 else k * 10)
    }.toMap

  test("partitioned checkpoints prune on the partition filter; content exact") {
    val root = freshRoot()
    mkChain(root)
    // the cadence checkpoint is Hive-partitioned on disk
    def partDirs(v: Int): Int =
      Option(new java.io.File(s"$root/c$v").listFiles())
        .map(_.count(f => f.isDirectory && f.getName.startsWith("grp="))).getOrElse(0)
    assert(partDirs(1) === 3 && partDirs(3) === 3)
    // planning-time file pruning, read off the EXECUTED scan's own
    // numFiles metric (inputFiles reports the relation pre-filter, so
    // it cannot see pruning)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.getOrElse(sys.error("no FileSourceScanExec in the plan"))
    }
    val all = scannedFiles(spark.read.parquet(s"$root/c3"))
    val pruned = scannedFiles(
      spark.read.parquet(s"$root/c3").where(col("grp") === "g1"))
    assert(pruned < all, s"no pruning: $pruned of $all files")
    // and the pruned plan names the partition filter
    val plan = spark.read.parquet(s"$root/c3").where(col("grp") === "g1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("grp"),
      s"partition filter not pushed:\n$plan")
    // content identical to the residue recompute, full and filtered
    val got = DeltaChain.readAsOf(spark, root, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expectV3)
    val filtered = DeltaChain.readAsOf(spark, root, 3)
      .where(col("grp") === "g2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(filtered === expectV3.filter { case (k, _) => k % 3 == 2 })
  }

  test("optimize and addColumn keep working on a partitioned chain") {
    import spark.implicits._
    val root = freshRoot()
    mkChain(root)
    DeltaChain.addColumn(spark, root, "v2x", "v * 2") // v4: empty UNpartitioned record
    assert(spark.read.parquet(s"$root/d4").count() === 0)
    val v5 = DeltaChain.optimize(spark, root, numFiles = 1)
    assert(v5 === 5)
    // compacted checkpoint is still partitioned AND carries the column
    val c5 = new java.io.File(s"$root/c5")
    assert(Option(c5.listFiles()).get
      .count(f => f.isDirectory && f.getName.startsWith("grp=")) === 3)
    val head = DeltaChain.read(spark, root)
    assert(head.columns.toSet === Set("k", "v", "grp", "v2x"))
    val got = head.collect().map(r =>
      r.getAs[Long]("k") -> r.getAs[Long]("v2x")).toMap
    assert(got === expectV3.map { case (k, v) => k -> v * 2 })
    // and the changelog window spanning it all still unions cleanly
    assert(DeltaChain.changelog(spark, root, 1, 5).count() ===
      (900L / 7 + 900L / 5))
  }

  test("partitioned and unpartitioned chains read set-equal at every version") {
    import spark.implicits._
    val pRoot = freshRoot(); val uRoot = freshRoot()
    val base = (1L to 600L).map(k => (k, k, s"g${k % 4}")).toDF("k", "v", "grp")
    DeltaChain.create(pRoot, base, Seq("k"), checkpointEvery = 2,
      partitionBy = Seq("grp"))
    DeltaChain.create(uRoot, base, Seq("k"), checkpointEvery = 2)
    val d2 = (1L to 600L).filter(_ % 3 == 0)
      .map(k => (k, k + 7, s"g${k % 4}", k % 9 == 0)).toDF("k", "v", "grp", "del")
    Seq(pRoot, uRoot).foreach(r =>
      DeltaChain.commitDelta(spark, r, d2, Some("del")))
    (1 to 2).foreach { v =>
      val a = DeltaChain.readAsOf(spark, pRoot, v).select("k", "v", "grp")
      val b = DeltaChain.readAsOf(spark, uRoot, v).select("k", "v", "grp")
      assert(a.exceptAll(b).count() + b.exceptAll(a).count() === 0L,
        s"partitioned chain diverges at v$v")
    }
    // key-column partitioning is refused (singleton dirs per upsert)
    val e = intercept[IllegalArgumentException] {
      DeltaChain.create(freshRoot(), base, Seq("k"), 2, partitionBy = Seq("k"))
    }
    assert(e.getMessage.contains("coarser"))
  }

  test("numeric-looking STRING partition values survive the checkpoint round-trip") {
    import spark.implicits._
    val root = freshRoot()
    // ADVICE r15: Hive partition-column type inference reads '01' back
    // as the integer 1 — the schema sidecar must pin the written type
    DeltaChain.create(root,
      Seq((1L, 10L, "01"), (2L, 20L, "2"), (3L, 30L, "007"))
        .toDF("k", "v", "code"),
      Seq("k"), checkpointEvery = 2, partitionBy = Seq("code"))
    DeltaChain.commitDelta(spark, root,
      Seq((1L, 11L, "01")).toDF("k", "v", "code"))      // v2
    DeltaChain.commitDelta(spark, root,
      Seq((2L, 22L, "2")).toDF("k", "v", "code"))       // v3 -> checkpoint
    // both the direct checkpoint read (v3) and the replay path (v2)
    // must preserve the string values AND the string type
    Seq(2, 3).foreach { v =>
      val df = DeltaChain.readAsOf(spark, root, v)
      assert(df.schema("code").dataType ===
        org.apache.spark.sql.types.StringType,
        s"v$v retyped the partition column: ${df.schema("code").dataType}")
      val codes = df.select("k", "code").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(codes === Map(1L -> "01", 2L -> "2", 3L -> "007"),
        s"v$v lost partition values: $codes")
    }
  }

  test("a checkpoint of an EMPTY state keeps the chain readable") {
    import spark.implicits._
    val root = freshRoot()
    // ADVICE r15: a partitioned write of zero rows lands no parquet
    // footer at all — the anchor used to be unreadable
    DeltaChain.create(root,
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "v", "grp"),
      Seq("k"), checkpointEvery = 2, partitionBy = Seq("grp"))
    DeltaChain.commitDelta(spark, root,
      Seq((1L, 0L, "a", true), (2L, 0L, "b", true))
        .toDF("k", "v", "grp", "del"), Some("del"))     // v2 deletes ALL rows
    DeltaChain.commitDelta(spark, root,
      Seq((9L, 90L, "a")).toDF("k", "v", "grp"))        // v3 -> EMPTY-state cp? no:
    // cadence fires at v3 (3-1 >= 2) with one live row; force the
    // empty case directly: delete it and optimize (forced checkpoint
    // of the now-empty state)
    DeltaChain.commitDelta(spark, root,
      Seq((9L, 0L, "a", true)).toDF("k", "v", "grp", "del"), Some("del")) // v4
    DeltaChain.optimize(spark, root, numFiles = 1)      // v5: checkpoint of EMPTY
    assert(DeltaChain.read(spark, root).count() === 0L)
    assert(DeltaChain.readAsOf(spark, root, 3)
      .select("k").collect().map(_.getLong(0)).toSet === Set(9L))
    // the chain keeps working off the empty anchor
    DeltaChain.commitDelta(spark, root,
      Seq((5L, 50L, "b")).toDF("k", "v", "grp"))        // v6
    val head = DeltaChain.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(head === Set((5L, 50L, "b")))
  }
}
