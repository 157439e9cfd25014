package graft

/** Laws for [[graft.operators.DeltaChain.optimize]] (VERDICT r14 item
  * 2 — small-file compaction for streaming-ingest chains) and
  * [[graft.operators.DeltaChain.changesRange]] (item 4 — batched CDF
  * in one replay). The q69/q66b oracle hashes are the end-to-end
  * authority; these pin the mechanisms: history preservation across
  * optimize, the changelog-neutral empty change record, truncate
  * reclaiming the pre-compaction run, and changesRange's exact
  * equivalence to the per-version feed on every edge (checkpoint
  * boundary, delete-of-absent, insert-after-delete, schema addition).
  */
class DeltaOptimizeSpec extends SparkSpec {
  import operators.DeltaChain

  private def freshRoot(): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_dopt_spec_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  private def state(root: String, v: Int): Map[Long, Long] =
    DeltaChain.readAsOf(spark, root, v)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def parquetFiles(dir: String): Int =
    Option(new java.io.File(dir).listFiles())
      .map(_.count(f => f.isFile && f.getName.endsWith(".parquet")))
      .getOrElse(0)

  test("optimize: head read compacts to numFiles; every version's content survives") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root,
      (1L to 50L).map(k => (k, 0L)).toDF("k", "n").repartition(4), Seq("k"),
      checkpointEvery = 100)
    (1 to 5).foreach { i =>
      DeltaChain.commitDelta(spark, root,
        (1L to 50L).filter(_ % (i + 4) == 0).map(k => (k, i.toLong))
          .toDF("k", "n").coalesce(1))
    }
    val before = (1 to 6).map(v => state(root, v))
    val headFilesBefore = parquetFiles(s"$root/c1") +
      (2 to 6).map(v => parquetFiles(s"$root/d$v")).sum
    val v7 = DeltaChain.optimize(spark, root, numFiles = 1)
    assert(v7 === 7)
    // head read now touches exactly the compacted checkpoint
    assert(new java.io.File(root, "c7").exists())
    assert(parquetFiles(s"$root/c7") === 1)
    assert(parquetFiles(s"$root/c7") < headFilesBefore)
    // the change record is empty: optimize is changelog-neutral
    assert(spark.read.parquet(s"$root/d7").count() === 0)
    val logBefore = DeltaChain.changelog(spark, root, 1, 6).count()
    assert(DeltaChain.changelog(spark, root, 1, 7).count() === logBefore)
    // every committed version replays byte-identically, and v7 == v6
    (1 to 6).foreach(v => assert(state(root, v) === before(v - 1),
      s"optimize changed the content of v$v"))
    assert(state(root, 7) === before(5))
    // the chain keeps working: a post-optimize commit replays off c7
    DeltaChain.commitDelta(spark, root, Seq((1L, 99L)).toDF("k", "n"))
    assert(state(root, 8) === before(5) + (1L -> 99L))
    // truncate at the optimize version reclaims the small-file run
    DeltaChain.truncate(root, 7)
    assert(!new java.io.File(root, "c1").exists())
    (2 to 6).foreach(v => assert(!new java.io.File(root, s"d$v").exists(),
      s"truncate after optimize left small file d$v"))
    assert(state(root, 8) === before(5) + (1L -> 99L))
  }

  test("optimize after addColumn materializes the column into the compact checkpoint") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L), (2L, 20L)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 100)
    DeltaChain.addColumn(spark, root, "n2", "n * 2")
    DeltaChain.optimize(spark, root)
    val cp = spark.read.parquet(s"$root/c3")
    assert(cp.columns.toSeq === Seq("k", "n", "n2"))
    assert(cp.collect().map(r => (r.getLong(0), r.getLong(2))).toSet ===
      Set((1L, 20L), (2L, 40L)))
    // time travel below the addition stays narrow
    assert(DeltaChain.readAsOf(spark, root, 1).columns.toSeq === Seq("k", "n"))
  }

  test("optimizeClustered: content preserved, layout Morton-ordered, numFiles honored") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root,
      (1L to 400L).map(k => (k, (k * 37) % 100)).toDF("k", "x").repartition(4),
      Seq("k"), checkpointEvery = 100)
    DeltaChain.commitDelta(spark, root,
      (1L to 400L).filter(_ % 5 == 0).map(k => (k, k % 100)).toDF("k", "x")
        .coalesce(1))
    val before = DeltaChain.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v3 = DeltaChain.optimizeClustered(spark, root, "k", "x", numFiles = 2)
    assert(v3 === 3)
    assert(parquetFiles(s"$root/c3") === 2)
    assert(spark.read.parquet(s"$root/d3").count() === 0)
    val after = DeltaChain.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after === before, "clustered optimize changed table content")
    // the layout genuinely moved: per-file key ranges are disjoint-ish
    // under the range shuffle (each file covers a contiguous Morton
    // band, so the two files cannot both span the full key range)
    val spans = Option(new java.io.File(s"$root/c3").listFiles()).get
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val d = spark.read.parquet(f.getAbsolutePath)
          .agg(org.apache.spark.sql.functions.min("k"),
            org.apache.spark.sql.functions.max("k")).collect()(0)
        (d.getLong(0), d.getLong(1))
      }
    assert(spans.length === 2)
    assert(spans.exists { case (lo, hi) => hi - lo < 399 },
      s"no file shows a narrowed range — clustering did not move rows: ${spans.toSeq}")
  }

  test("changesRange == union of changesAt across every edge case") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root,
      Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "n"), Seq("k"),
      checkpointEvery = 3) // a checkpoint lands mid-range (v4)
    // v2: update 1, delete 3, delete-of-absent 9 (no-op)
    DeltaChain.commitDelta(spark, root,
      Seq((1L, 11L, false), (3L, 999L, true), (9L, 0L, true))
        .toDF("k", "n", "del"), Some("del"))
    // v3: insert-after-delete of 3, insert 4
    DeltaChain.commitDelta(spark, root,
      Seq((3L, 33L, false), (4L, 40L, false)).toDF("k", "n", "del"), Some("del"))
    // v4 (checkpointed): update 4, delete 2
    DeltaChain.commitDelta(spark, root,
      Seq((4L, 44L, false), (2L, 0L, true)).toDF("k", "n", "del"), Some("del"))
    // v5: re-delete 2 (absent — no-op), update 1
    DeltaChain.commitDelta(spark, root,
      Seq((2L, 0L, true), (1L, 12L, false)).toDF("k", "n", "del"), Some("del"))

    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String, Int)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3))).toSet
    val batched = rows(DeltaChain.changesRange(spark, root, 1, 5))
    val perVersion = (2 to 5).flatMap { v =>
      rows(DeltaChain.changesAt(spark, root, v)
        .withColumn("_commit_version", org.apache.spark.sql.functions.lit(v)))
    }.toSet
    assert(batched === perVersion,
      s"changesRange diverges from per-version changesAt:\n" +
        s"only-batched=${batched -- perVersion}\nonly-per=${perVersion -- batched}")
    // spot-pin the heart of it: preimages are state values, no-ops gone
    assert(batched.contains((3L, 30L, "delete", 2)))
    assert(batched.contains((3L, 33L, "insert", 3)))
    assert(!batched.exists(r => r._1 == 9L || (r._1 == 2L && r._4 == 5)))
    // a sub-range starting past the checkpoint replays the prefix into
    // its base state rather than emitting it
    val tail = rows(DeltaChain.changesRange(spark, root, 3, 5))
    val tailPer = (4 to 5).flatMap { v =>
      rows(DeltaChain.changesAt(spark, root, v)
        .withColumn("_commit_version", org.apache.spark.sql.functions.lit(v)))
    }.toSet
    assert(tail === tailPer)
  }

  test("changesRange's prune guard: both arms taken, outputs identical (r18)") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String, Int)] =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3))).toSet
    def perVersion(root: String, vs: Range): Set[(Long, Long, String, Int)] =
      vs.flatMap { v =>
        rows(DeltaChain.changesAt(spark, root, v)
          .withColumn("_commit_version", org.apache.spark.sql.functions.lit(v)))
      }.toSet
    // CDC shape: big base, tiny window → the touched-key prune is active
    val cdc = freshRoot()
    DeltaChain.create(cdc,
      spark.range(0L, 1000L).selectExpr("id AS k", "id * 10 AS n"),
      Seq("k"), checkpointEvery = 100)
    DeltaChain.commitDelta(spark, cdc, Seq((7L, 71L), (8L, 81L)).toDF("k", "n"))
    DeltaChain.commitDelta(spark, cdc, Seq((7L, 72L)).toDF("k", "n"))
    assert(DeltaChain.rangePruneActive(cdc, 1, 3),
      "tiny window over a big base must keep the touched-key prune")
    assert(rows(DeltaChain.changesRange(spark, cdc, 1, 3)) === perVersion(cdc, 2 to 3))
    // rewrite shape: the window touches most of the table → guard skips
    // the prune (its delta re-read + semi-join would cost more than the
    // full-width window it exists to avoid), output identical
    val rw = freshRoot()
    DeltaChain.create(rw,
      spark.range(0L, 1000L).selectExpr("id AS k", "id * 10 AS n"),
      Seq("k"), checkpointEvery = 100)
    DeltaChain.commitDelta(spark, rw,
      spark.range(0L, 1000L).selectExpr("id AS k", "id * 10 + 1 AS n"))
    DeltaChain.commitDelta(spark, rw,
      spark.range(0L, 1000L).selectExpr("id AS k", "id * 10 + 2 AS n"))
    assert(!DeltaChain.rangePruneActive(rw, 1, 3),
      "table-scale window must skip the prune — it is pure overhead there")
    assert(rows(DeltaChain.changesRange(spark, rw, 1, 3)) === perVersion(rw, 2 to 3))
  }

  test("changesRange spanning a schema addition backfills pre-addition rows") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L)).toDF("k", "n"), Seq("k"),
      checkpointEvery = 100)
    DeltaChain.commitDelta(spark, root, Seq((2L, 20L)).toDF("k", "n")) // v2
    DeltaChain.addColumn(spark, root, "n2", "n * 2")                   // v3
    DeltaChain.commitDelta(spark, root,
      Seq((1L, 11L, 111L)).toDF("k", "n", "n2"))                       // v4
    val got = DeltaChain.changesRange(spark, root, 1, 4)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getInt(4)))
      .toSet
    assert(got === Set(
      (2L, 20L, 40L, "insert", 2),          // backfilled n2 = n*2
      (1L, 10L, 20L, "update_preimage", 4), // preimage backfills too
      (1L, 11L, 111L, "update_postimage", 4)))
  }
}
