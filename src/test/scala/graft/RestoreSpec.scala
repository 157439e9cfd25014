package graft

import org.apache.spark.sql.functions._

/** Laws for [[graft.operators.DeltaChain.restore]] (VERDICT r15 item
  * 2 — rollback as a forward commit). The q75 oracle hash is the
  * end-to-end authority (resurrected deletes, rolled-back updates,
  * deleted post-version inserts, MV-through-restore); these pin the
  * mechanics: the restoring delta is MINIMAL, constraints still guard
  * the write boundary, restores compose, and a restore projects
  * forward through schema changes.
  */
class RestoreSpec extends SparkSpec {
  import operators.DeltaChain

  private def freshRoot(): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_restore_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  private def stateOf(root: String, v: Int): Map[Long, Long] =
    DeltaChain.readAsOf(spark, root, v)
      .select("k", "n").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("the restoring delta is minimal: only the rows the rollback touches") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root,
      (1L to 100L).map(k => (k, k * 10)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 100)
    // v2 touches 10 keys; v3 inserts 2 new ones
    DeltaChain.commitDelta(spark, root,
      (1L to 10L).map(k => (k, k)).toDF("k", "n"))
    DeltaChain.commitDelta(spark, root,
      Seq((101L, 1L), (102L, 2L)).toDF("k", "n"))
    val v4 = DeltaChain.restore(spark, root, 1)
    assert(stateOf(root, v4) === (1L to 100L).map(k => k -> k * 10).toMap)
    // minimality: 10 re-upserts + 2 deletes, never the other 90 rows
    val deltaRows = spark.read.parquet(s"$root/d$v4").count()
    assert(deltaRows === 12L,
      s"restore delta carried $deltaRows rows; the diff is 12")
    val kinds = DeltaChain.history(spark, root)
      .select("version", "kind").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(kinds(v4) === "restore")
  }

  test("restores compose: restore of a restore, and history stays linear") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L), (2L, 20L)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 2)
    DeltaChain.commitDelta(spark, root, Seq((1L, 11L)).toDF("k", "n")) // v2+cp
    DeltaChain.commitDelta(spark, root, Seq((2L, 22L)).toDF("k", "n")) // v3
    DeltaChain.restore(spark, root, 2)                                 // v4+cp
    assert(stateOf(root, 4) === Map(1L -> 11L, 2L -> 20L))
    DeltaChain.restore(spark, root, 3)                                 // v5
    assert(stateOf(root, 5) === Map(1L -> 11L, 2L -> 22L))
    DeltaChain.restore(spark, root, 1)                                 // v6+cp
    assert(stateOf(root, 6) === Map(1L -> 10L, 2L -> 20L))
    assert(DeltaChain.versions(root) === Seq(1, 2, 3, 4, 5, 6))
    // every intermediate version still time-travels exactly
    assert(stateOf(root, 3) === Map(1L -> 11L, 2L -> 22L))
  }

  test("a restore that would violate a LATER constraint fails with nothing committed") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, -5L)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 100)
    DeltaChain.commitDelta(spark, root, Seq((1L, 5L)).toDF("k", "n"))  // v2
    DeltaChain.addConstraint(spark, root, "n_nonneg", "n >= 0")        // v3
    val e = intercept[IllegalArgumentException] {
      DeltaChain.restore(spark, root, 1) // would re-land n = -5
    }
    assert(e.getMessage.contains("n_nonneg"))
    assert(DeltaChain.versions(root) === Seq(1, 2, 3))
    assert(stateOf(root, 3) === Map(1L -> 5L))
  }

  test("changelog-inverted restore: roundtrips and self-cancelling keys stay out of the delta") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root,
      (1L to 50L).map(k => (k, k * 10)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 100)
    // k=1 value ROUNDTRIP (changed then changed back — touched, but
    // identical at head, so exceptAll semantics exclude it); k=2 a
    // real change; k=60 inserted then deleted (absent both ends)
    DeltaChain.commitDelta(spark, root,
      Seq((1L, 111L), (2L, 222L), (60L, 600L)).toDF("k", "n")) // v2
    DeltaChain.commitDelta(spark, root,
      Seq((1L, 10L)).toDF("k", "n"))                           // v3: roundtrip closes
    DeltaChain.commitDelta(spark, root,
      Seq((60L, 0L)).toDF("k", "n").withColumn("del", lit(true)), // v4: 60 gone
      Some("del"))
    val v5 = DeltaChain.restore(spark, root, 1)
    assert(stateOf(root, v5) === (1L to 50L).map(k => k -> k * 10).toMap)
    // minimality under the changelog inversion: ONLY k=2 needs an
    // upsert — the roundtripped k=1 and the self-cancelled k=60 were
    // touched in the window but are identical-or-absent at both ends
    val delta = spark.read.parquet(s"$root/d$v5")
    assert(delta.count() === 1L,
      s"restore delta carried ${delta.count()} rows; the diff is 1")
    assert(delta.select("k").collect().map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("restore below a schema change restores the DATA under the current shape") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L), (2L, 20L)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 100)
    DeltaChain.commitDelta(spark, root, Seq((1L, 99L)).toDF("k", "n")) // v2
    DeltaChain.renameColumn(spark, root, "n", "m")                     // v3
    DeltaChain.addColumn(spark, root, "n2", "m * 2")                   // v4
    val v5 = DeltaChain.restore(spark, root, 1)
    val head = DeltaChain.read(spark, root)
    assert(head.columns.toSeq === Seq("k", "m", "n2"))
    val got = head.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // v1's data projected forward: m carries the old n values, n2 the
    // read-time default over them
    assert(got === Set((1L, 10L, 20L), (2L, 20L, 40L)))
    assert(v5 === 5)
  }
}
