package graft

import org.apache.spark.sql.functions._

/** Laws for the DV mask broadcast-or-shuffle gate (VERDICT r14 item
  * 1): a deletion-vector mask is broadcast only while its on-disk
  * bytes fit under `spark.sql.autoBroadcastJoinThreshold` — past that
  * the anti-join degrades to a shuffled join instead of accumulating a
  * driver-OOM-sized broadcast. The reads must be HASH-IDENTICAL across
  * both paths (the gate is a physical-plan choice, never a semantics
  * one), and the big-mask plan must genuinely carry no broadcast
  * exchange.
  */
class DvMaskFallbackSpec extends SparkSpec {
  import operators.VersionedTable

  private def freshRoot(): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_dvgate_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  private def withThreshold[T](v: String)(body: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, v)
    try body finally spark.conf.set(key, old)
  }

  test("mask past the broadcast threshold reads hash-identically via the shuffled path") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root,
      (1L to 5000L).map(k => (k, s"row$k")).toDF("k", "v").repartition(4))
    // delete 40% — a mask far larger than the tiny threshold below
    VersionedTable.deleteWhereDV(spark, root, col("k") % 5 <= 1)
    val expect = (1L to 5000L).filter(_ % 5 > 1).toSet

    def readKeys(): Set[Long] =
      VersionedTable.readAsOf(spark, root, 2)
        .select("k").collect().map(_.getLong(0)).toSet
    def plan(): String =
      VersionedTable.readAsOf(spark, root, 2)
        .queryExecution.executedPlan.toString

    // default threshold: the mask broadcasts (the realistic-rate path)
    assert(plan().contains("BroadcastHashJoin"),
      "small-mask read should broadcast the mask")
    assert(readKeys() === expect)

    // 1-byte threshold: any mask is over it — the join must NOT build a
    // broadcast relation, and the rows must be identical
    withThreshold("1") {
      val p = plan()
      assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastExchange"),
        s"big-mask read must degrade to a shuffled anti-join; plan was:\n$p")
      assert(readKeys() === expect,
        "shuffled-path read diverged from the broadcast-path read")
    }
  }

  test("threshold '-1' (auto-broadcast disabled) takes the shuffled path, never crashes") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root,
      (1L to 1000L).map(k => (k, k * 2)).toDF("k", "v").repartition(2))
    VersionedTable.deleteWhereDV(spark, root, col("k") % 4 === 0)
    // ADVICE r15: '-1' — the standard disable value — used to throw
    // NumberFormatException out of the byte-suffix parser, crashing
    // every DV read AND write; it must parse as "never broadcast"
    withThreshold("-1") {
      val df = VersionedTable.readAsOf(spark, root, 2)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastExchange"),
        s"threshold -1 must disable the mask broadcast; plan was:\n$p")
      assert(df.select("k").collect().map(_.getLong(0)).toSet ===
        (1L to 1000L).filterNot(_ % 4 == 0).toSet)
      // the write path parses the same conf — a chained DV delete and
      // a bitmap-mask commit must both survive '-1'
      VersionedTable.deleteWhereDV(spark, root, col("k") % 9 === 0)
    }
    val got = VersionedTable.read(spark, root)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got === (1L to 1000L).filterNot(k => k % 4 == 0 || k % 9 == 0).toSet)
  }

  test("a DV write (chained delete) also survives the shuffled path") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root,
      (1L to 2000L).map(k => (k, k * 10)).toDF("k", "x").repartition(2))
    VersionedTable.deleteWhereDV(spark, root, col("k") % 2 === 0)
    // the SECOND DV commit reads the live set through withRowIdentity —
    // force that read down the shuffled path too
    withThreshold("1") {
      VersionedTable.deleteWhereDV(spark, root, col("k") % 3 === 0)
      VersionedTable.updateWhereDV(spark, root, col("k") % 7 === 0,
        Seq("x" -> (col("x") + 1L)))
    }
    val got = VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (1L to 2000L).filter(k => k % 2 != 0 && k % 3 != 0)
      .map(k => k -> (if (k % 7 == 0) k * 10 + 1 else k * 10)).toMap
    assert(got === want)
  }
}
