package graft

import org.apache.spark.sql.functions._

/** Laws for the delta-commit storage mode (VERDICT r13 item 2). The
  * q64 oracle hash is the authority for chain-level equivalence; these
  * pin the mechanisms a hash can't name — checkpoint cadence at both
  * extremes, replay across delete/re-insert, write-boundary
  * validation, changelog verbatim-ness, and the orphan-dir
  * invisibility the publish-by-rename protocol promises.
  */
class DeltaChainSpec extends SparkSpec {
  import operators.DeltaChain

  private def freshRoot(): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_dchain_spec_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  private def state(root: String, v: Int): Map[Long, String] =
    DeltaChain.readAsOf(spark, root, v)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("replay: upsert, delete, re-insert land exactly, at every version") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), Seq("k"),
      checkpointEvery = 10) // no checkpoint before v10: pure replay path
    DeltaChain.commitDelta(spark, root,
      Seq((2L, "b2", false), (3L, "c", true)).toDF("k", "v", "del"), Some("del"))
    DeltaChain.commitDelta(spark, root,
      Seq((3L, "c3", false), (4L, "d", false)).toDF("k", "v", "del"), Some("del"))
    assert(state(root, 1) === Map(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(state(root, 2) === Map(1L -> "a", 2L -> "b2"))
    // k=3 deleted at v2 then re-inserted at v3: last-writer-wins replay
    assert(state(root, 3) === Map(1L -> "a", 2L -> "b2", 3L -> "c3", 4L -> "d"))
  }

  test("checkpoint cadence: every=1 checkpoints each commit; large interval never does") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, "a")).toDF("k", "v"), Seq("k"),
      checkpointEvery = 1)
    DeltaChain.commitDelta(spark, root,
      Seq((2L, "b")).toDF("k", "v"))
    DeltaChain.commitDelta(spark, root,
      Seq((1L, "a2")).toDF("k", "v"))
    def has(n: String) = new java.io.File(root, n).exists()
    assert(has("c1") && has("c2") && has("c3") && has("d2") && has("d3"))
    // a checkpointed version reads straight from its checkpoint — pin
    // the content so "cadence" is not just a directory-name fact
    assert(state(root, 3) === Map(1L -> "a2", 2L -> "b"))
  }

  test("write boundary: duplicate keys and null keys are rejected loudly") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    val dup = intercept[IllegalArgumentException] {
      DeltaChain.commitDelta(spark, root,
        Seq((2L, "x"), (2L, "y")).toDF("k", "v"))
    }
    assert(dup.getMessage.contains("duplicate"))
    val nul = intercept[IllegalArgumentException] {
      DeltaChain.commitDelta(spark, root,
        Seq((Option.empty[Long], "x")).toDF("k", "v"))
    }
    assert(nul.getMessage.contains("NULL key"))
    // both rejected commits must leave NO committed version behind
    assert(DeltaChain.versions(root) === Seq(1))
  }

  test("changelog: stored ops come back verbatim with their commit version") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), Seq("k"))
    DeltaChain.commitDelta(spark, root,
      Seq((1L, "a2", false), (2L, "b", true)).toDF("k", "v", "del"), Some("del"))
    DeltaChain.commitDelta(spark, root,
      Seq((5L, "e", false)).toDF("k", "v", "del"), Some("del"))
    val log = DeltaChain.changelog(spark, root, 1, 3)
      .select("_commit_version", "_change_type", "k", "v")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(log === Set(
      (2, "upsert", 1L, "a2"), (2, "delete", 2L, "b"), (3, "upsert", 5L, "e")))
    // a window narrower than the full chain unions only its deltas
    assert(DeltaChain.changelog(spark, root, 2, 3).count() === 1)
  }

  test("crash safety: an orphan delta dir no manifest references is invisible") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    // simulate a writer that died after writing d2 but before publish:
    // the dir exists, the manifest does not reference it
    Seq((1L, "ZOMBIE", false)).toDF("k", "v", "del")
      .withColumn("_op", lit("U")).drop("del")
      .write.parquet(s"$root/d2")
    assert(DeltaChain.latestVersion(root) === 1)
    assert(state(root, 1) === Map(1L -> "a"))
    intercept[IllegalArgumentException] {
      DeltaChain.readAsOf(spark, root, 2)
    }
  }

  test("truncate: cut AT a checkpoint reclaims everything beneath") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, "a")).toDF("k", "v"), Seq("k"),
      checkpointEvery = 2)
    DeltaChain.commitDelta(spark, root, Seq((2L, "b")).toDF("k", "v")) // v2 (2-1<2)
    DeltaChain.commitDelta(spark, root, Seq((3L, "c")).toDF("k", "v")) // v3 + c3
    DeltaChain.commitDelta(spark, root, Seq((4L, "d")).toDF("k", "v")) // v4
    assert(DeltaChain.truncate(root, keepFrom = 3) === Seq(3, 4))
    def has(n: String) = new java.io.File(root, n).exists()
    // c3 is the anchor AT the cut: everything at-or-below it dies
    // (c1, d2, d3); d4 stays — v4 replays from c3 + d4
    assert(has("c3") && has("d4") && !has("c1") && !has("d2") && !has("d3"))
    intercept[IllegalArgumentException] { DeltaChain.readAsOf(spark, root, 2) }
    assert(state(root, 3) === Map(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(state(root, 4) === Map(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
    // the chain keeps committing after the cut
    DeltaChain.commitDelta(spark, root, Seq((5L, "e")).toDF("k", "v")) // v5 + c5
    assert(DeltaChain.versions(root) === Seq(3, 4, 5))
    assert(state(root, 5).keySet === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("truncate: an anchor BELOW the cut keeps its replay fuel alive") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, "a")).toDF("k", "v"), Seq("k"),
      checkpointEvery = 10) // only c1 ever exists
    DeltaChain.commitDelta(spark, root, Seq((2L, "b")).toDF("k", "v")) // d2
    DeltaChain.commitDelta(spark, root, Seq((3L, "c")).toDF("k", "v")) // d3
    assert(DeltaChain.truncate(root, keepFrom = 3) === Seq(3))
    def has(n: String) = new java.io.File(root, n).exists()
    // c1 is unmanifested but alive (the anchor); d2 survives as replay
    // fuel for v3; d1 never existed and c1's own delta record is gone
    assert(has("c1") && has("d2") && has("d3"))
    assert(DeltaChain.versions(root) === Seq(3))
    intercept[IllegalArgumentException] { DeltaChain.readAsOf(spark, root, 1) }
    assert(state(root, 3) === Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // commits still work off the disk-resolved anchor
    DeltaChain.commitDelta(spark, root, Seq((1L, "a2")).toDF("k", "v"))
    assert(state(root, 4) === Map(1L -> "a2", 2L -> "b", 3L -> "c"))
  }

  test("addColumn: metadata-only widen, read-time backfill, narrow time travel") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L), (2L, 250L)).toDF("k", "q"), Seq("k"),
      checkpointEvery = 10)
    DeltaChain.commitDelta(spark, root, Seq((2L, 260L)).toDF("k", "q")) // v2
    val v3 = DeltaChain.addColumn(spark, root, "band", "CAST(q DIV 100 AS BIGINT)")
    assert(v3 === 3)
    // time travel below the addition: narrow schema
    assert(DeltaChain.readAsOf(spark, root, 2).columns.toSeq === Seq("k", "q"))
    // at the addition: every stored row backfills from ITS OWN values
    val got3 = DeltaChain.readAsOf(spark, root, 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got3 === Map(1L -> ((10L, 0L)), 2L -> ((260L, 2L))))
    // the add-column commit wrote only an empty change record
    val d3 = new java.io.File(s"$root/d3")
    assert(d3.exists())
    assert(spark.read.parquet(d3.getAbsolutePath).count() === 0)
    // later commits must carry the column; rows written wide stay wide
    intercept[IllegalArgumentException] {
      DeltaChain.commitDelta(spark, root, Seq((3L, 5L)).toDF("k", "q"))
    }
    DeltaChain.commitDelta(spark, root,
      Seq((3L, 777L, 99L)).toDF("k", "q", "band")) // v4: explicit band
    val got4 = DeltaChain.readAsOf(spark, root, 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got4 === Map(1L -> ((10L, 0L)), 2L -> ((260L, 2L)), 3L -> ((777L, 99L))))
    // a checkpoint AFTER the addition materializes wide, and replay
    // from it stays consistent
    DeltaChain.commitDelta(spark, root, Seq((1L, 11L, 0L)).toDF("k", "q", "band"))
    assert(DeltaChain.readAsOf(spark, root, 5)
      .where(col("k") === 1L).collect()(0).getLong(1) === 11L)
    // changelog spanning the addition unions under the window-end schema
    val log = DeltaChain.changelog(spark, root, 1, 5)
    assert(log.columns.contains("band"))
    assert(log.count() === 3) // d2 (1 row) + d3 (0, the add) + d4 (1) + d5 (1)
  }

  test("commitDelta: a delta missing table columns is rejected before any write") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, "a")).toDF("k", "v"), Seq("k"))
    val e = intercept[IllegalArgumentException] {
      DeltaChain.commitDelta(spark, root, Seq(Tuple1(2L)).toDF("k"))
    }
    assert(e.getMessage.contains("every table column"))
    assert(!new java.io.File(root, "d2").exists())
  }
}
