package graft

/** Laws for CHECK constraints on the delta chain's write boundary
  * ([[graft.operators.DeltaChain.addConstraint]]): metadata-only add,
  * ANSI violation semantics (NULL passes, FALSE violates, delete rows
  * exempt), fail-loudly-by-name with nothing committed, drop/re-add
  * version tracking, and the optional existing-state validation.
  */
class DeltaConstraintSpec extends SparkSpec {
  import operators.DeltaChain

  private def freshRoot(): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_dcon_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  test("violating commit fails by name and commits nothing; NULL passes; deletes exempt") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root,
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), Seq("k"), checkpointEvery = 100)
    DeltaChain.addConstraint(spark, root, "v_nonneg", "v >= 0") // v2
    val e = intercept[IllegalArgumentException] {
      DeltaChain.commitDelta(spark, root,
        Seq((3L, -5L), (4L, 40L)).toDF("k", "v"))
    }
    assert(e.getMessage.contains("v_nonneg") && e.getMessage.contains("1 delta row"))
    assert(DeltaChain.versions(root) === Seq(1, 2), "violating commit left a version")
    // NULL predicate passes (ANSI CHECK), and a delete row whose
    // payload violates is exempt — it's a row LEAVING the table
    DeltaChain.commitDelta(spark, root,
      Seq((Some(5L), None: Option[Long], false), (Some(1L), Some(-99L), true))
        .toDF("k", "v", "del"), Some("del"))
    assert(DeltaChain.read(spark, root)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap ===
      Map(2L -> Some(20L), 5L -> None))
    // the add was metadata-only: its change record holds zero rows
    assert(spark.read.parquet(s"$root/d2").count() === 0)
  }

  test("drop stops enforcement; re-add binds the new predicate") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L)).toDF("k", "v"), Seq("k"),
      checkpointEvery = 100)
    DeltaChain.addConstraint(spark, root, "cap", "v < 100")    // v2
    intercept[IllegalArgumentException] {
      DeltaChain.commitDelta(spark, root, Seq((2L, 500L)).toDF("k", "v"))
    }
    DeltaChain.dropConstraint(spark, root, "cap")              // v3
    DeltaChain.commitDelta(spark, root, Seq((2L, 500L)).toDF("k", "v")) // v4 ok
    DeltaChain.addConstraint(spark, root, "cap", "v < 1000")   // v5, new predicate
    intercept[IllegalArgumentException] {
      DeltaChain.commitDelta(spark, root, Seq((3L, 5000L)).toDF("k", "v"))
    }
    DeltaChain.commitDelta(spark, root, Seq((3L, 999L)).toDF("k", "v")) // v6
    assert(DeltaChain.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 10L, 2L -> 500L, 3L -> 999L))
  }

  test("history: kinds derive from artifacts, incl. the truncated anchor") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L)).toDF("k", "v"), Seq("k"),
      checkpointEvery = 2)
    DeltaChain.commitDelta(spark, root, Seq((2L, 20L)).toDF("k", "v")) // v2
    DeltaChain.commitDelta(spark, root, Seq((3L, 30L)).toDF("k", "v")) // v3 + c3
    DeltaChain.addConstraint(spark, root, "pos", "v > 0")              // v4
    DeltaChain.dropConstraint(spark, root, "pos")                      // v5
    def kinds() = DeltaChain.history(spark, root)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(kinds() === Map(1 -> "create", 2 -> "delta", 3 -> "delta",
      4 -> "add_constraint", 5 -> "drop_constraint"))
    // truncate at the checkpoint: v3's change record is reclaimed and
    // the surviving manifest entry reads as the chain's anchor
    DeltaChain.truncate(root, 3)
    assert(kinds() === Map(3 -> "checkpoint_anchor",
      4 -> "add_constraint", 5 -> "drop_constraint"))
  }

  test("validateExisting refuses a constraint the current state violates") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, -1L)).toDF("k", "v"), Seq("k"))
    val e = intercept[IllegalArgumentException] {
      DeltaChain.addConstraint(spark, root, "v_nonneg", "v >= 0",
        validateExisting = true)
    }
    assert(e.getMessage.contains("existing row"))
    assert(DeltaChain.versions(root) === Seq(1))
    // without validation the add lands (Delta semantics: existing rows
    // are grandfathered; only new writes are checked)
    DeltaChain.addConstraint(spark, root, "v_nonneg", "v >= 0")
    assert(DeltaChain.versions(root) === Seq(1, 2))
  }
}
