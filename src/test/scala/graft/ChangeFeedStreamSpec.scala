package graft

import org.apache.spark.sql.streaming.Trigger

/** Laws for [[graft.operators.DeltaChain.readChangeFeedStream]]
  * (VERDICT r14 item 7 — the changelog as a structured stream). The
  * t29 oracle hash is the end-to-end authority (stream → replica ==
  * source); these pin the source mechanics: the streamed rows are
  * EXACTLY the batch changelog's, the fromVersion resume point
  * filters, and the version-aware backfill distinguishes pre-addition
  * NULL-surfaced columns from explicitly-written values — the case
  * the batch readers' column-existence test cannot see.
  */
class ChangeFeedStreamSpec extends SparkSpec {
  import operators.DeltaChain

  private def freshRoot(): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_cfs_spec_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  private def drain(df: org.apache.spark.sql.DataFrame, name: String)
      : Seq[org.apache.spark.sql.Row] = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000L), s"$name drain expired")
    spark.table(name).collect().toSeq
  }

  test("streamed feed == batch changelog; fromVersion filters the resume point") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L), (2L, 20L)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 100)
    DeltaChain.commitDelta(spark, root,
      Seq((1L, 11L, false), (2L, 0L, true)).toDF("k", "n", "del"), Some("del"))
    DeltaChain.commitDelta(spark, root,
      Seq((3L, 30L, false)).toDF("k", "n", "del"), Some("del"))
    val streamed = drain(
      DeltaChain.readChangeFeedStream(spark, root, fromVersion = 1), "cfs_all")
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3))).toSet
    val batch = DeltaChain.changelog(spark, root, 1, 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getInt(r.fieldIndex("_commit_version")),
        r.getString(r.fieldIndex("_change_type")))).toSet
    assert(streamed === batch,
      s"streamed feed diverges from batch changelog:\n$streamed\nvs\n$batch")
    assert(streamed === Set(
      (1L, 11L, 2, "upsert"), (2L, 0L, 2, "delete"), (3L, 30L, 3, "upsert")))
    // resume from v2: only v3's rows arrive
    val tail = drain(
      DeltaChain.readChangeFeedStream(spark, root, fromVersion = 2), "cfs_tail")
      .map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(tail === Set((3L, 3)))
  }

  test("version-aware backfill: pre-addition rows compute the default, post keep stored") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L)).toDF("k", "n"), Seq("k"),
      checkpointEvery = 100)
    DeltaChain.commitDelta(spark, root, Seq((2L, 20L)).toDF("k", "n")) // v2 narrow
    DeltaChain.addColumn(spark, root, "n2", "n * 2")                   // v3
    DeltaChain.commitDelta(spark, root,
      Seq((2L, 21L, 999L)).toDF("k", "n", "n2"))                       // v4 wide
    val rows = drain(
      DeltaChain.readChangeFeedStream(spark, root, fromVersion = 1), "cfs_bf")
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getInt(r.fieldIndex("_commit_version")))).toSet
    // v2's stored file has no n2 column: the wide declared schema
    // surfaces NULL, and the version-aware backfill computes n*2=40;
    // v4's explicitly-written 999 passes through untouched. v3's
    // addColumn change record is empty (zero rows).
    assert(rows === Set((2L, 20L, 40L, 2), (2L, 21L, 999L, 4)))
  }

  test("a freshly created chain (head == 1) feeds empty, then live after a commit") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L)).toDF("k", "n"), Seq("k"),
      checkpointEvery = 100)
    // ADVICE r15: the old schema derivation read d{head}, which does
    // not exist at head == 1 — this call used to crash
    val empty = drain(
      DeltaChain.readChangeFeedStream(spark, root, fromVersion = 1), "cfs_fresh")
    assert(empty.isEmpty)
    DeltaChain.commitDelta(spark, root, Seq((2L, 20L)).toDF("k", "n"))
    val live = drain(
      DeltaChain.readChangeFeedStream(spark, root, fromVersion = 1), "cfs_fresh2")
      .map(r => (r.getLong(0), r.getLong(1),
        r.getInt(r.fieldIndex("_commit_version")))).toSet
    assert(live === Set((2L, 20L, 2)))
  }

  test("a baseDir containing /d<digits>/ does not poison the version stamp") {
    import spark.implicits._
    // ADVICE r15: the unanchored regex took the FIRST /d\d+/ match in
    // the whole path, so this layout stamped every row version 7
    val outer = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_cfs_d7_${java.util.UUID.randomUUID().toString.take(8)}/d7")
    QueryGuard.deleteRecOnExit(outer.getParentFile)
    val root = new java.io.File(outer, "tbl").getAbsolutePath
    DeltaChain.create(root, Seq((1L, 10L)).toDF("k", "n"), Seq("k"),
      checkpointEvery = 100)
    DeltaChain.commitDelta(spark, root, Seq((2L, 20L)).toDF("k", "n")) // v2
    DeltaChain.commitDelta(spark, root, Seq((3L, 30L)).toDF("k", "n")) // v3
    val vers = drain(
      DeltaChain.readChangeFeedStream(spark, root, fromVersion = 1), "cfs_d7")
      .map(r => (r.getLong(0), r.getInt(r.fieldIndex("_commit_version")))).toSet
    assert(vers === Set((2L, 2), (3L, 3)))
  }

  test("identical mtimes across the d9/d10 boundary still deliver monotone") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 0L)).toDF("k", "n"), Seq("k"),
      checkpointEvery = 100)
    (2 to 12).foreach { v =>
      DeltaChain.commitDelta(spark, root, Seq((1L, v.toLong)).toDF("k", "n"))
    }
    // force the trap: every delta file in the SAME mtime granule, so a
    // (mtime, path) order is purely lexicographic — d10 < d9 (VERDICT
    // r15 item 3; the old per-file trigger delivered exactly that)
    val t = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 60000)
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
    try walk.forEach(p => java.nio.file.Files.setLastModifiedTime(p, t))
    finally walk.close()
    // t29-style consumer: batches replay sorted by version and REQUIRE
    // strict +1 monotonicity across the whole run
    val applied = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = DeltaChain.readChangeFeedStream(spark, root, fromVersion = 1)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val vs = b.select("_commit_version").distinct()
          .collect().map(_.getInt(0)).sorted
        vs.foreach { v =>
          val last = applied.lastOption.getOrElse(1)
          require(v == last + 1,
            s"feed delivered v$v after v$last — non-monotone")
          applied += v
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000L), "monotone drain expired")
    assert(applied.toSeq === (2 to 12).toSeq)
  }

  test("the feed projects across a rename: old-name rows surface under the new name") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L)).toDF("k", "n"), Seq("k"),
      checkpointEvery = 100)
    DeltaChain.commitDelta(spark, root, Seq((2L, 20L)).toDF("k", "n")) // v2 (old name)
    DeltaChain.renameColumn(spark, root, "n", "m")                     // v3
    DeltaChain.commitDelta(spark, root, Seq((3L, 30L)).toDF("k", "m")) // v4 (new name)
    val rows = drain(
      DeltaChain.readChangeFeedStream(spark, root, fromVersion = 1), "cfs_ren")
      .map(r => (r.getLong(r.fieldIndex("k")), r.getLong(r.fieldIndex("m")),
        r.getInt(r.fieldIndex("_commit_version")))).toSet
    assert(rows === Set((2L, 20L, 2), (3L, 30L, 4)))
  }

  test("a rename CHAIN (a->b->c) resolves every vintage to the head name") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L)).toDF("k", "a"), Seq("k"),
      checkpointEvery = 100)
    DeltaChain.commitDelta(spark, root, Seq((2L, 20L)).toDF("k", "a")) // v2 as 'a'
    DeltaChain.renameColumn(spark, root, "a", "b")                     // v3
    DeltaChain.commitDelta(spark, root, Seq((3L, 30L)).toDF("k", "b")) // v4 as 'b'
    DeltaChain.renameColumn(spark, root, "b", "c")                     // v5
    DeltaChain.commitDelta(spark, root, Seq((4L, 40L)).toDF("k", "c")) // v6 as 'c'
    val rows = drain(
      DeltaChain.readChangeFeedStream(spark, root, fromVersion = 1), "cfs_chain")
      .map(r => (r.getLong(r.fieldIndex("k")), r.getLong(r.fieldIndex("c")),
        r.getInt(r.fieldIndex("_commit_version")))).toSet
    assert(rows === Set((2L, 20L, 2), (3L, 30L, 4), (4L, 40L, 6)))
    // and the batch range feed agrees on the window-end schema
    val batch = DeltaChain.changesRange(spark, root, 1, 6)
    assert(batch.columns.contains("c") &&
      !batch.columns.contains("a") && !batch.columns.contains("b"))
  }

  test("the feed never leaks pre-drop values into a re-added incarnation") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L, "old")).toDF("k", "n", "tag"),
      Seq("k"), checkpointEvery = 100)
    DeltaChain.commitDelta(spark, root,
      Seq((2L, 20L, "preDrop")).toDF("k", "n", "tag"))                 // v2
    DeltaChain.dropColumn(spark, root, "tag")                          // v3
    DeltaChain.addColumn(spark, root, "tag", "'fresh'")                // v4
    DeltaChain.commitDelta(spark, root,
      Seq((3L, 30L, "stored")).toDF("k", "n", "tag"))                  // v5
    val rows = drain(
      DeltaChain.readChangeFeedStream(spark, root, fromVersion = 1), "cfs_leak")
      .map(r => (r.getLong(r.fieldIndex("k")),
        r.getString(r.fieldIndex("tag")),
        r.getInt(r.fieldIndex("_commit_version")))).toSet
    // v2's stored 'preDrop' is DESTROYED by the drop: the feed's head
    // projection backfills the re-added incarnation's default instead
    assert(rows === Set((2L, "fresh", 2), (3L, "stored", 5)))
  }

  test("conflicting types for one physical name across timelines refuse loudly") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 100)
    DeltaChain.commitDelta(spark, root, Seq((2L, 20L)).toDF("k", "n")) // v2
    // original LONG `n` renamed away (old files still store LONGs under
    // the physical name `n`), then a FRESH `n` added as STRING: the two
    // incarnations now share the physical name with different types —
    // no single declared read schema can serve both (ADVICE r16: the
    // first-match type silently corrupted whichever lost)
    DeltaChain.renameColumn(spark, root, "n", "m")                     // v3
    DeltaChain.addColumn(spark, root, "n", "CAST(m AS STRING)")        // v4
    val e = intercept[IllegalArgumentException] {
      DeltaChain.readChangeFeedStream(spark, root, fromVersion = 1)
    }
    assert(e.getMessage.contains("conflicting types"))
  }
}
