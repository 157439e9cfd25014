package graft

import org.apache.spark.sql.functions._

/** Laws for the hardened [[graft.operators.DeltaChain.history]]
  * (ADVICE r15 / VERDICT r15 item 4): operation kinds come from
  * commit-time metadata — an EMPTY data delta landing on the
  * checkpoint cadence is labeled `delta`, never `optimize` — and the
  * change-row counts come from ONE multi-dir scan instead of a
  * per-version job loop (same numbers, O(1) jobs).
  */
class HistoryKindsSpec extends SparkSpec {
  import operators.DeltaChain

  private def freshRoot(): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_hk_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  test("an empty data delta on the checkpoint cadence is 'delta', optimize is 'optimize'") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, Seq((1L, 10L), (2L, 20L)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 2)
    DeltaChain.commitDelta(spark, root, Seq((1L, 11L)).toDF("k", "n")) // v2
    // a legitimately EMPTY commit that lands exactly on the cadence:
    // same artifacts as optimize (zero-row d3 + c3) — the kind must
    // still read 'delta' because nothing recorded 'optimize'
    DeltaChain.commitDelta(spark, root,
      Seq.empty[(Long, Long)].toDF("k", "n"))                          // v3 + c3
    DeltaChain.optimize(spark, root, numFiles = 1)                     // v4
    val h = DeltaChain.history(spark, root)
      .select("version", "kind", "delta_rows", "checkpointed").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(h === Set(
      (1, "create", 0L, true),
      (2, "delta", 1L, false),
      (3, "delta", 0L, true),
      (4, "optimize", 0L, true)))
  }

  test("the one-scan counts match per-version counts on a mixed chain") {
    import spark.implicits._
    val root = freshRoot()
    DeltaChain.create(root, (1L to 50L).map(k => (k, k)).toDF("k", "n"),
      Seq("k"), checkpointEvery = 3)
    DeltaChain.commitDelta(spark, root,
      (1L to 7L).map(k => (k, k + 1)).toDF("k", "n"))                  // v2: 7
    DeltaChain.renameColumn(spark, root, "n", "m")                     // v3: 0
    DeltaChain.commitDelta(spark, root,
      (1L to 4L).map(k => (k, k)).toDF("k", "m"))                      // v4: 4
    DeltaChain.addColumn(spark, root, "n2", "m * 2")                   // v5: 0
    DeltaChain.commitDelta(spark, root,
      (10L to 12L).map(k => (k, k, k)).toDF("k", "m", "n2"))           // v6: 3
    val got = DeltaChain.history(spark, root)
      .select("version", "delta_rows").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expect = (2 to 6).map { v =>
      v -> spark.read.parquet(s"$root/d$v").count()
    }.toMap + (1 -> 0L)
    assert(got === expect)
    assert(expect === Map(1 -> 0L, 2 -> 7L, 3 -> 0L, 4 -> 4L, 5 -> 0L, 6 -> 3L))
  }
}
