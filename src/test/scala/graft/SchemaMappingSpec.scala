package graft

import org.apache.spark.sql.functions._

/** Laws for [[graft.operators.DeltaChain.dropColumn]] /
  * [[graft.operators.DeltaChain.renameColumn]] (VERDICT r15 item 1 —
  * metadata-only column mapping). The q74 oracle hash is the
  * end-to-end authority; these pin the edges: destroyed values never
  * leak into a re-added incarnation, time travel below a change keeps
  * the old shape, every refusal fires loudly, the change feed
  * projects across the boundaries, and an arbitrated loser re-reads
  * the live schema/constraint set on retry (ADVICE r15).
  */
class SchemaMappingSpec extends SparkSpec {
  import operators.DeltaChain

  private def freshRoot(): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_smap_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  test("drop-then-re-add same name: pre-drop values never leak; travel keeps shapes") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root,
      Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("k", "n", "tag"),
      Seq("k"), checkpointEvery = 100)
    DeltaChain.dropColumn(spark, root, "tag")                          // v2
    DeltaChain.commitDelta(spark, root, Seq((3L, 30L)).toDF("k", "n")) // v3
    DeltaChain.addColumn(spark, root, "tag", "'fresh'")                // v4
    DeltaChain.commitDelta(spark, root,
      Seq((4L, 40L, "stored")).toDF("k", "n", "tag"))                  // v5
    // head: the re-added incarnation backfills 'fresh' everywhere the
    // writer didn't store a value — the old 'a'/'b' are DESTROYED
    val head = DeltaChain.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(head === Map(1L -> "fresh", 2L -> "fresh", 3L -> "fresh",
      4L -> "stored"))
    // time travel: below the drop the OLD values live on; between drop
    // and re-add the column is gone
    val v1 = DeltaChain.readAsOf(spark, root, 1)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(v1 === Map(1L -> "a", 2L -> "b"))
    assert(DeltaChain.readAsOf(spark, root, 3).columns.toSeq === Seq("k", "n"))
  }

  test("rename moves values; the old name dies at the boundary both ways") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L), (2L, 20L)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 2)
    DeltaChain.renameColumn(spark, root, "n", "m")                     // v2
    DeltaChain.commitDelta(spark, root, Seq((2L, 21L)).toDF("k", "m")) // v3 + cadence cp
    assert(DeltaChain.readAsOf(spark, root, 1).columns.toSeq === Seq("k", "n"))
    assert(DeltaChain.read(spark, root).columns.toSeq === Seq("k", "m"))
    val head = DeltaChain.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(head === Map(1L -> 10L, 2L -> 21L))
    // a commit still using the old name is rejected BY NAME
    val e1 = intercept[IllegalArgumentException] {
      DeltaChain.commitDelta(spark, root, Seq((3L, 30L)).toDF("k", "n"))
    }
    assert(e1.getMessage.contains("n") && e1.getMessage.contains("m"))
    // changesRange spanning the rename carries the window-end schema
    val feed = DeltaChain.changesRange(spark, root, 1, 3)
    assert(feed.columns.contains("m") && !feed.columns.contains("n"))
    val post = feed.where(col("_change_type") === "update_postimage")
      .collect().map(r => (r.getLong(r.fieldIndex("k")),
        r.getLong(r.fieldIndex("m")))).toSet
    assert(post === Set((2L, 21L)))
  }

  test("every refusal fires: key, partition col, constraint ref, default ref, collision") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root,
      Seq((1L, 10L, "p1"), (2L, 20L, "p2")).toDF("k", "n", "part"),
      Seq("k"), checkpointEvery = 100, partitionBy = Seq("part"))
    assert(intercept[IllegalArgumentException] {
      DeltaChain.dropColumn(spark, root, "k")
    }.getMessage.contains("key column"))
    assert(intercept[IllegalArgumentException] {
      DeltaChain.renameColumn(spark, root, "part", "part2")
    }.getMessage.contains("partition column"))
    DeltaChain.addConstraint(spark, root, "n_pos", "n > 0")
    assert(intercept[IllegalArgumentException] {
      DeltaChain.dropColumn(spark, root, "n")
    }.getMessage.contains("n_pos"))
    DeltaChain.dropConstraint(spark, root, "n_pos")
    DeltaChain.addColumn(spark, root, "n2", "n * 2")
    assert(intercept[IllegalArgumentException] {
      DeltaChain.renameColumn(spark, root, "n", "nn")
    }.getMessage.contains("read-time default"))
    assert(intercept[IllegalArgumentException] {
      DeltaChain.renameColumn(spark, root, "n2", "n")
    }.getMessage.contains("already exists"))
    // a constraint whose predicate can't resolve is refused at ADD time
    assert(intercept[IllegalArgumentException] {
      DeltaChain.addConstraint(spark, root, "bad", "no_such_col > 0")
    }.getMessage.contains("does not resolve"))
    // dropping the added column itself is fine — its default dies with it
    DeltaChain.dropColumn(spark, root, "n2")
    // ... after which the base column is rename-able again
    DeltaChain.renameColumn(spark, root, "n", "nn")
    assert(DeltaChain.read(spark, root).columns.toSeq === Seq("k", "nn", "part"))
  }

  test("a backtick-quoted constraint reference refuses drop/rename like a bare one") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 100)
    // ADVICE r16: with backtick in referencesColumn's boundary classes,
    // a constraint written with a quoted identifier slipped past the
    // fail-closed check and left an unresolvable stored expression
    DeltaChain.addConstraint(spark, root, "n_pos_quoted", "`n` > 0")
    assert(intercept[IllegalArgumentException] {
      DeltaChain.dropColumn(spark, root, "n")
    }.getMessage.contains("n_pos_quoted"))
    assert(intercept[IllegalArgumentException] {
      DeltaChain.renameColumn(spark, root, "n", "m")
    }.getMessage.contains("n_pos_quoted"))
    // the table stays fully readable after the refusals
    assert(DeltaChain.read(spark, root).count() === 1L)
  }

  test("snapshot-form parity: VersionedTable drop/rename rewrite, old versions keep shape") {
    import spark.implicits._
    import operators.VersionedTable
    val root = freshRoot()
    VersionedTable.create(root, Seq((1L, 10L, "a"), (2L, 20L, "b"))
      .toDF("k", "n", "tag"))
    VersionedTable.renameColumn(spark, root, "n", "m")    // v2 (rewrite)
    VersionedTable.dropColumn(spark, root, "tag")         // v3 (rewrite)
    assert(VersionedTable.read(spark, root).columns.toSeq === Seq("k", "m"))
    assert(VersionedTable.readAsOf(spark, root, 1).columns.toSeq ===
      Seq("k", "n", "tag"))
    assert(VersionedTable.read(spark, root).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap === Map(1L -> 10L, 2L -> 20L))
    assert(intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, root, "m", "k")
    }.getMessage.contains("already exists"))
    assert(intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, root, "nope")
    }.getMessage.contains("not a column"))
  }

  test("arbitrated loser re-reads meta: a concurrently added constraint binds the retry") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 100)
    // orphan-claim v2 so the arbitrated writer stages, loses, and waits
    val marker = java.nio.file.Paths.get(root, "_commit_v2")
    java.nio.file.Files.createFile(marker)
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() => {
      try DeltaChain.commitDeltaArbitrated(spark, root,
        Seq((2L, -5L)).toDF("k", "n"), maxAttempts = 3,
        publishWaitMs = 30000L)
      catch { case e: Throwable => failure.set(e) }
    })
    t.start()
    // let the writer stage and enter its wait, then land the
    // constraint AS v2 (publishing the version the loser waits on)
    Thread.sleep(4000)
    DeltaChain.addConstraint(spark, root, "n_nonneg", "n >= 0")
    t.join(60000)
    assert(!t.isAlive, "arbitrated writer never finished")
    val e = failure.get()
    assert(e != null && e.getMessage.contains("n_nonneg"),
      s"loser's retry must re-validate under the live constraint set; got $e")
    // nothing beyond the constraint commit landed
    assert(DeltaChain.versions(root) === Seq(1, 2))
  }
}
