package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for optimistic multi-writer commit arbitration (VERDICT r13
  * item 3): two deliberately interleaved committers racing for the
  * same version must serialize through the create-new claim marker
  * with NO lost update and a linear history, and an orphaned claim
  * must fail loudly instead of wedging silently.
  */
class ConcurrentCommitSpec extends SparkSpec {
  import operators.VersionedTable

  private def freshRoot(): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_ccommit_spec_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  test("two interleaved committers: one collision, no lost update, linear history") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root,
      (1L to 10L).map(k => (k, 0L)).toDF("k", "n"))

    // Both writers must READ THE SAME BASE VERSION before either
    // claims — the latch releases only once both computes have run, so
    // the first CAS collision is guaranteed, not scheduler-dependent.
    // A rebase attempt passes the latch immediately (count already 0).
    val bothRead = new CountDownLatch(2)
    def writer(tag: String, cond: org.apache.spark.sql.Column)
        : ((Int, Int), Throwable) = {
      var res: (Int, Int) = (0, 0)
      var err: Throwable = null
      try {
        res = VersionedTable.commitNextArbitrated(spark, root, { df: DataFrame =>
          val out = df.withColumn("n", when(cond, col("n") + 1).otherwise(col("n")))
          bothRead.countDown()
          assert(bothRead.await(30, TimeUnit.SECONDS),
            s"$tag: peer never reached the read barrier")
          out
        })
      } catch { case t: Throwable => err = t }
      (res, err)
    }
    var a: ((Int, Int), Throwable) = null
    var b: ((Int, Int), Throwable) = null
    val ta = new Thread(() => a = writer("A", col("k") % 2 === 0))
    val tb = new Thread(() => b = writer("B", col("k") % 2 =!= 0))
    ta.start(); tb.start()
    ta.join(120000); tb.join(120000)
    assert(a != null && b != null, "a committer thread never finished")
    assert(a._2 == null, s"writer A failed: ${a._2}")
    assert(b._2 == null, s"writer B failed: ${b._2}")

    // linear history: exactly v1, v2, v3 — the two committers took
    // distinct versions, and the loser's retry consumed one extra attempt
    assert(VersionedTable.versions(root) === Seq(1, 2, 3))
    assert(Set(a._1._1, b._1._1) === Set(2, 3))
    assert(Seq(a._1, b._1).map(_._2).sorted === Seq(1, 2),
      s"expected one clean win and one rebase, got attempts ${Seq(a._1, b._1)}")

    // no lost update: BOTH writers' increments are present in v3 —
    // every even key and every odd key reads 1
    val fin = VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fin === (1L to 10L).map(k => k -> 1L).toMap,
      s"lost update: final state $fin")
    // and time travel shows the intermediate version carries exactly
    // ONE writer's change (the winner's), never a blend
    val v2Ones = VersionedTable.readAsOf(spark, root, 2)
      .where(col("n") === 1).count()
    assert(v2Ones === 5, s"v2 should hold exactly one writer's rows, got $v2Ones")
  }

  test("orphaned claim: a marker with no publish fails loudly, names the marker") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root, Seq((1L, 0L)).toDF("k", "n"))
    // simulate a writer that died between claim and publish
    java.nio.file.Files.createFile(java.nio.file.Paths.get(root, "_commit_v2"))
    val e = intercept[IllegalStateException] {
      VersionedTable.commitNextArbitrated(spark, root,
        (df: DataFrame) => df, publishWaitMs = 300L)
    }
    assert(e.getMessage.contains("orphaned claim"))
    assert(e.getMessage.contains("_commit_v2"))
    // the loser's staging dir must not leak
    val staged = new java.io.File(root).listFiles()
      .count(_.getName.startsWith(".stage_"))
    assert(staged === 0, "staging dir leaked after a lost claim")
  }

  test("sequential arbitrated commits need no retry and stack linearly") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root, Seq((1L, 0L)).toDF("k", "n"))
    val (v2, a2) = VersionedTable.commitNextArbitrated(spark, root,
      (df: DataFrame) => df.withColumn("n", col("n") + 10L))
    val (v3, a3) = VersionedTable.commitNextArbitrated(spark, root,
      (df: DataFrame) => df.withColumn("n", col("n") + 100L))
    assert((v2, a2) === ((2, 1)))
    assert((v3, a3) === ((3, 1)))
    assert(VersionedTable.read(spark, root).collect()(0).getLong(1) === 110L)
  }
}
