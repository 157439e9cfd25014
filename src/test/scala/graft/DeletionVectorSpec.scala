package graft

import org.apache.spark.sql.functions._

/** Laws for merge-on-read deletes (VERDICT r13 item 4). The q65 oracle
  * hash is the authority for end-state equivalence with copy-on-write;
  * these pin the mechanisms the hash can't name — mask accumulation
  * across chained DV commits, mask materialization by rewriting
  * commits, vacuum reachability (a surviving DV version keeps its base
  * snapshot alive past manifest expiry), and stability across a
  * multi-file base.
  */
class DeletionVectorSpec extends SparkSpec {
  import operators.VersionedTable

  private def freshRoot(): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_dv_spec_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  private def keys(root: String, v: Int): Set[Long] =
    VersionedTable.readAsOf(spark, root, v)
      .select("k").collect().map(_.getLong(0)).toSet

  test("chained DV deletes accumulate one mask; every version time-travels") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root,
      (1L to 30L).map(k => (k, s"r$k")).toDF("k", "v").repartition(3))
    VersionedTable.deleteWhereDV(spark, root, col("k") % 3 === 0)
    VersionedTable.deleteWhereDV(spark, root, col("k") % 5 === 0)
    assert(keys(root, 1) === (1L to 30L).toSet)
    assert(keys(root, 2) === (1L to 30L).filter(_ % 3 != 0).toSet)
    assert(keys(root, 3) === (1L to 30L).filter(k => k % 3 != 0 && k % 5 != 0).toSet)
    // v3's sidecar holds the union mask: 10 (mod-3) + 4 (mod-5 not mod-3)
    val mask = spark.read.parquet(s"$root/v3/_dv")
    assert(mask.count() === 14)
    assert(mask.columns.toSet === Set("file_path", "row_index"))
    // base files untouched throughout, and both DV versions point at v1
    def ptr(v: Int) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/v$v/_dv_base"))).trim
    assert(ptr(2).endsWith("/v1") && ptr(3).endsWith("/v1"))
  }

  test("a rewriting commit (compact) materializes the mask away") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root,
      (1L to 20L).map(k => (k, k * 10)).toDF("k", "w").repartition(4))
    VersionedTable.deleteWhereDV(spark, root, col("k") > 15)
    VersionedTable.compact(spark, root, 1)
    // v3 is a plain snapshot: no DV sidecar, masked rows physically gone
    assert(!new java.io.File(s"$root/v3/_dv_base").exists())
    assert(keys(root, 3) === (1L to 15L).toSet)
    // and a DV on top of the compacted snapshot bases on v3, not v1
    VersionedTable.deleteWhereDV(spark, root, col("k") === 1L)
    val ptr = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/v4/_dv_base"))).trim
    assert(ptr.endsWith("/v3"))
    assert(keys(root, 4) === (2L to 15L).toSet)
  }

  test("expire keeps a base snapshot alive while a surviving DV references it") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root, (1L to 10L).map(k => (k, k)).toDF("k", "w"))
    VersionedTable.deleteWhereDV(spark, root, col("k") % 2 === 0) // v2 = DV on v1
    VersionedTable.expire(root, keepFrom = 2)
    // manifest: v1 gone; physically: v1's data MUST survive (v2 reads it)
    assert(VersionedTable.versions(root) === Seq(2))
    assert(new java.io.File(s"$root/v1").exists(),
      "vacuum deleted a data dir a live DV version references")
    intercept[IllegalArgumentException] {
      VersionedTable.readAsOf(spark, root, 1)
    }
    assert(keys(root, 2) === Set(1L, 3L, 5L, 7L, 9L))
    // once the DV version is itself expired after a rewrite, the base
    // becomes unreachable and a later expire may remove it
    VersionedTable.compact(spark, root, 1) // v3 plain
    VersionedTable.expire(root, keepFrom = 3)
    assert(!new java.io.File(s"$root/v2").exists())
    assert(!new java.io.File(s"$root/v1").exists(),
      "v1 no longer referenced — vacuum should reclaim it")
  }

  test("updateWhereDV: patch rows supersede masked originals; base untouched") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root,
      (1L to 20L).map(k => (k, k * 10)).toDF("k", "w").repartition(2))
    def baseFiles = Option(new java.io.File(s"$root/v1").listFiles())
      .map(_.filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length())).toSet).getOrElse(Set.empty)
    val before = baseFiles
    VersionedTable.updateWhereDV(spark, root,
      col("k") % 5 === 0, Seq("w" -> (col("w") + 1L)))
    assert(baseFiles === before, "merge-on-read update rewrote base files")
    assert(new java.io.File(s"$root/v2/_dv_extra").exists())
    val got = VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (1L to 20L).map(k =>
      k -> (if (k % 5 == 0) k * 10 + 1 else k * 10)).toMap)
    // v1 still time-travels to the pre-update state
    assert(VersionedTable.readAsOf(spark, root, 1)
      .where(col("w") === 51L).count() === 0)
  }

  test("a later DV delete can mask a patch row (patch identity is stable)") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root, (1L to 10L).map(k => (k, k)).toDF("k", "w"))
    VersionedTable.updateWhereDV(spark, root,
      col("k") === 3L, Seq("w" -> lit(333L)))
    // delete BY THE UPDATED VALUE: the row now lives in v2's patch file
    VersionedTable.deleteWhereDV(spark, root, col("w") === 333L)
    assert(keys(root, 3) === ((1L to 10L).toSet - 3L))
    // and chained update-then-update: the second patch supersedes the first
    VersionedTable.updateWhereDV(spark, root,
      col("k") === 4L, Seq("w" -> lit(444L)))
    VersionedTable.updateWhereDV(spark, root,
      col("k") === 4L, Seq("w" -> (col("w") + 1L)))
    val w4 = VersionedTable.read(spark, root)
      .where(col("k") === 4L).collect()(0).getLong(1)
    assert(w4 === 445L)
    assert(VersionedTable.read(spark, root).where(col("k") === 4L).count() === 1)
  }

  test("expire keeps an expired version dir whose patch files a live DV reads") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root, (1L to 6L).map(k => (k, k)).toDF("k", "w"))
    VersionedTable.updateWhereDV(spark, root,
      col("k") === 2L, Seq("w" -> lit(22L)))          // v2 patches live in v2/
    VersionedTable.deleteWhereDV(spark, root, col("k") === 5L) // v3 reads v1 + v2 patches
    VersionedTable.expire(root, keepFrom = 3)
    assert(VersionedTable.versions(root) === Seq(3))
    // v2's dir must survive: v3's _dv_base references v2/_dv_extra
    assert(new java.io.File(s"$root/v2/_dv_extra").exists(),
      "vacuum deleted a patch dir a live DV version references")
    assert(VersionedTable.read(spark, root)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 1L, 2L -> 22L, 3L -> 3L, 4L -> 4L, 6L -> 6L))
  }

  test("DV delete matching zero rows commits an empty-delta version") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root, Seq((1L, "a")).toDF("k", "v"))
    VersionedTable.deleteWhereDV(spark, root, col("k") === 999L)
    assert(VersionedTable.versions(root) === Seq(1, 2))
    assert(keys(root, 2) === Set(1L))
  }

  test("history reports DV commit bytes as sidecar-sized, rows post-mask") {
    import spark.implicits._
    val root = freshRoot()
    VersionedTable.create(root,
      (1L to 1000L).map(k => (k, s"payload_payload_$k")).toDF("k", "v"))
    VersionedTable.deleteWhereDV(spark, root, col("k") % 100 === 0)
    val h = VersionedTable.history(spark, root)
      .orderBy("version")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    assert(h(0)._2 === 1000L && h(1)._2 === 990L)
    // the DV commit wrote a fraction of the snapshot's bytes
    assert(h(1)._3 * 2 < h(0)._3,
      s"DV commit bytes ${h(1)._3} not small vs snapshot ${h(0)._3}")
  }
}
