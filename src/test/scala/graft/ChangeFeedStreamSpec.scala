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
}
