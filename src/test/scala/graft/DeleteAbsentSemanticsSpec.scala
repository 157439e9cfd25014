package graft

/** Pins the delete-of-an-absent-key contract across the two storage
  * modes (ADVICE r14): [[graft.operators.DeltaChain]] replay treats it
  * as a no-op (CDC-apply — idempotent under at-least-once redelivery),
  * while [[graft.operators.MergeUpsert]] in its ANSI default INSERTS a
  * not-matched delete-flagged source row. The `insertUnmatchedDeletes
  * = false` policy aligns the snapshot form with the delta form, so
  * the SAME delta applied to both yields the SAME state — no row
  * resurrection when a stale delete is redelivered.
  */
class DeleteAbsentSemanticsSpec extends SparkSpec {
  import operators.{DeltaChain, MergeUpsert, VersionedTable}

  private def freshRoot(tag: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_delabs_${tag}_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  test("ANSI default: a not-matched delete-flagged row inserts (pinned divergence)") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // k=9 is absent from the target and flagged for delete
    val source = Seq((2L, "b2", false), (9L, "ghost", true)).toDF("k", "v", "del")
    val out = MergeUpsert.mergeUpsert(target, source, Seq("k"), Some("del"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "a", 2L -> "b2", 9L -> "ghost"))
  }

  test("CDC policy: delete-of-absent is a no-op; redelivery never resurrects") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val source = Seq((2L, "b2", false), (9L, "ghost", true)).toDF("k", "v", "del")
    val out = MergeUpsert.mergeUpsert(target, source, Seq("k"), Some("del"),
        insertUnmatchedDeletes = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "a", 2L -> "b2"))
    // redelivering a delete of a key deleted in an earlier batch: the
    // matched-delete happened at batch 1; batch 2 re-sends it
    val after1 = MergeUpsert.mergeUpsert(target,
      Seq((1L, "a", true)).toDF("k", "v", "del"), Seq("k"), Some("del"),
      insertUnmatchedDeletes = false)
    val after2 = MergeUpsert.mergeUpsert(after1,
      Seq((1L, "a", true)).toDF("k", "v", "del"), Seq("k"), Some("del"),
      insertUnmatchedDeletes = false)
    assert(after2.collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("mode equivalence: the same delta chain lands identically on both storage forms") {
    import spark.implicits._
    val dRoot = freshRoot("delta")
    val sRoot = freshRoot("snap")
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    DeltaChain.create(dRoot, base, Seq("k"), checkpointEvery = 10)
    VersionedTable.create(sRoot, base)
    // d2 deletes k=3; d3 re-sends that delete (absent by then) plus a
    // live update — the exact at-least-once redelivery shape
    val d2 = Seq((3L, "c", true), (2L, "b2", false)).toDF("k", "v", "del")
    val d3 = Seq((3L, "c", true), (1L, "a3", false)).toDF("k", "v", "del")
    Seq(d2, d3).foreach { dl =>
      DeltaChain.commitDelta(spark, dRoot, dl, Some("del"))
      VersionedTable.writeVersion(spark, sRoot, dl, Seq("k"), Some("del"),
        validateUniqueKeys = true, insertUnmatchedDeletes = false)
    }
    (1 to 3).foreach { v =>
      val a = DeltaChain.readAsOf(spark, dRoot, v)
      val b = VersionedTable.readAsOf(spark, sRoot, v)
      val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
      assert(diff === 0L,
        s"storage modes diverge at v$v on a chain with a delete-of-absent")
    }
    assert(DeltaChain.read(spark, dRoot)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "a3", 2L -> "b2"))
  }
}
