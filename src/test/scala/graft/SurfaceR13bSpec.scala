package graft

import org.apache.spark.sql.functions._

/** Laws for round-13 batch 2: the lakehouse suite. The oracle
  * hash-check is the authority for the registry keys; these pin the
  * mechanisms a hash can't name — Morton-code bit math, zone-map
  * conservatism (pruning never drops a matching row), CDF set algebra,
  * copy-on-write DML, and publish-then-delete expiry ordering.
  */
class SurfaceR13bSpec extends SparkSpec {
  import operators.{TableStats, VersionedTable, ZOrder}

  private def freshRoot(): java.io.File = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_r13b_spec_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f
  }

  // ---- ZOrder bit math ----

  test("zorder: spread16/morton2 match a reference bit-interleave on samples") {
    import spark.implicits._
    def mortonRef(x: Int, y: Int): Long = {
      var z = 0L
      var i = 0
      while (i < 16) {
        z |= ((x >> i) & 1).toLong << (2 * i)
        z |= ((y >> i) & 1).toLong << (2 * i + 1)
        i += 1
      }
      z
    }
    val samples = Seq((0, 0), (1, 0), (0, 1), (255, 255), (65535, 65535),
      (12345, 54321), (1, 65535), (32768, 1))
    val got = samples.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.morton2(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    samples.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y), s"morton2($x, $y)")
    }
  }

  test("zorder: Layout.zValue 16-bit delegation equals the per-bit fold") {
    import spark.implicits._
    // the old fold, inlined as the reference (a at odd bits, b at even)
    def foldRef(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i))
      }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L), (65536L + 5L, 3L)) // incl. >16-bit input
    val got = samples.toDF("a", "b")
      .select(col("a"), col("b"),
        operators.Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    samples.foreach { case (a, b) =>
      assert(got((a, b)) === foldRef(a & 0xFFFFL, b & 0xFFFFL), s"zValue($a, $b)")
    }
  }

  test("zorder: morton locality — files cut from z-ranges bound both dims") {
    import spark.implicits._
    val root = freshRoot()
    val df = (0 until 4096).map(i => (i % 64, (i / 64) % 64, i.toLong))
      .toDF("x", "y", "v")
    ZOrder.cluster(df, "x", "y", 16)
      .write.parquet(root.getAbsolutePath)
    val stats = TableStats.collect(spark, root.getAbsolutePath, Seq("x", "y"))
      .collect()
    // Each of the 16 files covers a z-range of 4096/16 = 256 z-values =
    // one 16x16 tile (possibly straddling one boundary): both per-file
    // spans must be far below the full 64-wide extent.
    stats.foreach { r =>
      val xSpan = r.getAs[Long]("x_max") - r.getAs[Long]("x_min")
      val ySpan = r.getAs[Long]("y_max") - r.getAs[Long]("y_min")
      assert(xSpan <= 32, s"x span $xSpan not tile-bounded")
      assert(ySpan <= 32, s"y span $ySpan not tile-bounded")
    }
  }

  test("rewriteClustered: OPTIMIZE ZORDER commits a version, moves bytes not rows") {
    import spark.implicits._
    val root = freshRoot().getAbsolutePath
    val df = (0 until 4096).map(i => ((i * 7 % 64).toLong, (i * 13 % 64).toLong, i.toLong))
      .toDF("x", "y", "v")
    VersionedTable.create(root, df.repartition(16))
    VersionedTable.rewriteClustered(spark, root, "x", "y", 8)
    assert(VersionedTable.versions(root) === Seq(1, 2))
    // rows identical across the rewrite
    def rows(ver: Int) = VersionedTable.readAsOf(spark, root, ver)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows(1) === rows(2))
    // layout actually clustered: the property that matters is PRUNING —
    // a quarter-box predicate must skip files on the rewritten layout
    // and cannot skip any on the random-partitioned v1 (per-file spans
    // there are full-width). Exact per-file span bounds would be
    // brittle: repartitionByRange samples its boundaries, so one file
    // can straddle two Morton tiles.
    def pruned(ver: Int): (Int, Int) = {
      val st = TableStats.collect(spark, s"$root/v$ver", Seq("x", "y"))
      val hit = TableStats.prunedPaths(st, Seq(("x", 0L, 15L), ("y", 0L, 15L))).size
      (hit, st.count().toInt)
    }
    val (hit1, total1) = pruned(1)
    val (hit2, total2) = pruned(2)
    assert(hit1 === total1, s"v1 unexpectedly clustered ($hit1 of $total1)")
    assert(hit2 * 2 < total2, s"v2 box scan not pruned ($hit2 of $total2)")
  }

  // ---- TableStats conservatism ----

  test("zone maps: pruned read is row-identical to full scan + filter") {
    import spark.implicits._
    val root = freshRoot()
    val df = (1 to 10000).map(i => (i.toLong, (i * 7 % 1000).toLong)).toDF("k", "w")
    df.repartitionByRange(8, col("k")).write.parquet(root.getAbsolutePath)
    val stats = TableStats.collect(spark, root.getAbsolutePath, Seq("k"))
    val (pruned, read, total) = TableStats.readPruned(spark, stats,
      Seq(("k", 2500L, 4999L)))
    assert(read < total, "a quarter-range predicate must prune on a range layout")
    val got = pruned.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (2500 to 4999).map(i => (i.toLong, (i * 7 % 1000).toLong))
    assert(got === want)
  }

  test("zone maps: conjunctive bounds — surviving one dim but not the other prunes") {
    import spark.implicits._
    val root = freshRoot()
    // x clustered ascending, y descending: every file's x-zone and
    // y-zone select DIFFERENT file subsets, so the conjunction must
    // intersect them
    val df = (0 until 1024).map(i => (i.toLong, (1023 - i).toLong)).toDF("x", "y")
    df.repartitionByRange(8, col("x")).write.parquet(root.getAbsolutePath)
    val stats = TableStats.collect(spark, root.getAbsolutePath, Seq("x", "y"))
    val xOnly = TableStats.prunedPaths(stats, Seq(("x", 0L, 127L))).toSet
    val yOnly = TableStats.prunedPaths(stats, Seq(("y", 0L, 127L))).toSet
    val both = TableStats.prunedPaths(stats,
      Seq(("x", 0L, 127L), ("y", 0L, 127L))).toSet
    assert(both === (xOnly intersect yOnly))
    // with this data x∈[0,127] ⇒ y∈[896,1023]: the conjunction with
    // y∈[0,127] is empty at FILE level too
    assert(both.isEmpty)
  }

  test("change feed: a null→value transition in a non-key column is an update") {
    import spark.implicits._
    val root = freshRoot().getAbsolutePath
    VersionedTable.create(root,
      Seq((1L, Option.empty[String]), (2L, Some("b"))).toDF("k", "v"))
    VersionedTable.writeVersion(spark, root,
      Seq((1L, Some("a"), false), (2L, Option.empty[String], false))
        .toDF("k", "v", "del"),
      Seq("k"))
    // both rows changed: null→"a" and "b"→null — the <=> comparison
    // must see both directions (a plain <> would see neither)
    val feed = VersionedTable.changes(spark, root, 1, 2, Seq("k"))
      .groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(feed === Map("update_preimage" -> 2L, "update_postimage" -> 2L))
  }

  test("zone maps: all-files-pruned predicate returns an empty frame, not an error") {
    import spark.implicits._
    val root = freshRoot()
    (1 to 100).map(_.toLong).toDF("k").write.parquet(root.getAbsolutePath)
    val stats = TableStats.collect(spark, root.getAbsolutePath, Seq("k"))
    // a predicate entirely outside the data range is a legitimate empty
    // selection (ADVICE r13): the scan/filter equivalence must hold for
    // zero rows — schema intact, zero files counted as read
    val (pruned, read, total) = TableStats.readPruned(
      spark, stats, Seq(("k", 5000L, 6000L)))
    assert(read === 0)
    assert(total >= 1)
    assert(pruned.columns.toSeq === Seq("k"))
    assert(pruned.count() === 0)
  }

  test("change feed: null-keyed rows classify instead of vanishing (ADVICE r13)") {
    import spark.implicits._
    val root = freshRoot().getAbsolutePath
    // v1 holds a null-keyed row whose value then changes in v2, plus a
    // null-keyed row that disappears is modeled by the k=9 delete; the
    // <=> join matches null keys as values, and presence now derives
    // from pre-join markers, so the null key lands in the update class
    // rather than falling out of all four (the old key-null presence
    // test classified it as neither inserted, deleted, nor updated)
    VersionedTable.create(root,
      Seq((Option.empty[Long], "x"), (Some(1L), "a"), (Some(9L), "z"))
        .toDF("k", "v"))
    VersionedTable.writeVersion(spark, root,
      Seq((Option.empty[Long], "x2", false), (Some(9L), "z", true))
        .toDF("k", "v", "del"),
      Seq("k"), Some("del"))
    val feed = VersionedTable.changes(spark, root, 1, 2, Seq("k"))
      .collect().map(r => (Option(r.get(0)), r.getString(1), r.getString(2))).toSeq
    assert(feed.count(_._3 == "update_preimage") === 1)
    assert(feed.count(_._3 == "update_postimage") === 1)
    assert(feed.filter(_._3.startsWith("update")).forall(_._1.isEmpty),
      "the null-keyed update must surface with its null key")
    assert(feed.exists(t => t._1.contains(9L) && t._3 == "delete"))
    assert(feed.size === 3, s"exact delta only, got $feed")
  }

  test("zone maps: an all-null stat column prunes the file (nulls match no range)") {
    import spark.implicits._
    val root = freshRoot()
    // file A: real values 1..100; file B: all-null k (two writes → two files)
    Seq.tabulate(100)(i => Some((i + 1).toLong)).toDF("k")
      .coalesce(1).write.mode("append").parquet(root.getAbsolutePath)
    Seq.fill(50)(Option.empty[Long]).toDF("k")
      .coalesce(1).write.mode("append").parquet(root.getAbsolutePath)
    val stats = TableStats.collect(spark, root.getAbsolutePath, Seq("k"))
    assert(stats.count() === 2)
    val paths = TableStats.prunedPaths(stats, Seq(("k", 1L, 100L)))
    // the all-null file's min/max are null → the zone predicate is null
    // → dropped; correct, because NULL can never satisfy a range filter
    assert(paths.size === 1)
    val (pruned, read, total) = TableStats.readPruned(spark, stats, Seq(("k", 1L, 100L)))
    assert((read, total) === ((1, 2)))
    assert(pruned.count() === 100)
  }

  test("zorder: cluster with more files than distinct z-values still round-trips") {
    import spark.implicits._
    val root = freshRoot()
    val df = Seq((1L, 1L, "a"), (1L, 1L, "b"), (2L, 2L, "c")).toDF("x", "y", "v")
    ZOrder.cluster(df, "x", "y", 16).write.parquet(root.getAbsolutePath)
    val got = spark.read.parquet(root.getAbsolutePath)
      .orderBy("v").collect().map(_.getString(2)).toSeq
    assert(got === Seq("a", "b", "c"))
  }

  // ---- VersionedTable DML + CDF + expiry ----

  test("change feed: insert/delete/update pre+post classify exactly") {
    import spark.implicits._
    val root = freshRoot().getAbsolutePath
    VersionedTable.create(root,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    VersionedTable.writeVersion(spark, root,
      Seq((2L, "b2", false), (3L, "c", true), (4L, "d", false)).toDF("k", "v", "del"),
      Seq("k"), Some("del"))
    val feed = VersionedTable.changes(spark, root, 1, 2, Seq("k"))
      .orderBy("k", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(feed === Seq(
      (2L, "b2", "update_postimage"), (2L, "b", "update_preimage"),
      (3L, "c", "delete"),
      (4L, "d", "insert")))
    // k=1 unchanged: no row at all — the feed is the exact delta
    assert(!feed.exists(_._1 == 1L))
  }

  test("deleteWhere/updateWhere commit versions; compact preserves rows") {
    import spark.implicits._
    val root = freshRoot().getAbsolutePath
    val base = (1 to 100).map(i => (i.toLong, i.toLong * 10)).toDF("k", "w")
    VersionedTable.create(root, base.repartition(16))
    VersionedTable.deleteWhere(spark, root, col("k") % 10 === 0)
    VersionedTable.updateWhere(spark, root, col("k") < 5,
      Seq("w" -> (col("w") + 1L)))
    VersionedTable.compact(spark, root, 2)
    assert(VersionedTable.versions(root) === Seq(1, 2, 3, 4))
    val want = (1 to 100).filter(_ % 10 != 0)
      .map(i => (i.toLong, i.toLong * 10 + (if (i < 5) 1 else 0)))
    def rows(v: Int) = VersionedTable.readAsOf(spark, root, v)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows(3) === want)
    assert(rows(4) === want, "compaction must move bytes, not rows")
    assert(rows(1).size === 100, "v1 untouched by the DML chain")
  }

  test("expire: manifest updates atomically, expired data dirs removed") {
    import spark.implicits._
    val root = freshRoot()
    val p = root.getAbsolutePath
    VersionedTable.create(p, Seq((1L, "a")).toDF("k", "v"))
    VersionedTable.updateWhere(spark, p, lit(true), Seq("v" -> lit("b")))
    VersionedTable.updateWhere(spark, p, lit(true), Seq("v" -> lit("c")))
    assert(VersionedTable.expire(p, keepFrom = 2) === Seq(2, 3))
    assert(VersionedTable.versions(p) === Seq(2, 3))
    assert(!new java.io.File(root, "v1").exists())
    intercept[IllegalArgumentException] {
      VersionedTable.readAsOf(spark, p, 1)
    }
    // keepFrom must itself be committed
    intercept[IllegalArgumentException] {
      VersionedTable.expire(p, keepFrom = 1)
    }
    assert(VersionedTable.read(spark, p).collect().map(_.getString(1)).toSeq === Seq("c"))
  }
}
