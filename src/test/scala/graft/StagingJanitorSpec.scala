package graft

/** Laws for the orphaned-staging janitor (VERDICT r15 item 5): a
  * writer killed -9 between staging and its `finally` leaks a
  * `.stage_*` dir forever; [[graft.operators.DeltaChain.truncate]] /
  * [[graft.operators.VersionedTable.expire]] now sweep those PAST an
  * age gate — a fresh dir (a live writer mid-commit) survives.
  */
class StagingJanitorSpec extends SparkSpec {
  import operators.{DeltaChain, VersionedTable}
  import java.nio.file.{Files, Paths}
  import java.nio.file.attribute.FileTime

  private def freshRoot(tag: String): String = {
    val f = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_jan_${tag}_${java.util.UUID.randomUUID().toString.take(8)}")
    QueryGuard.deleteRecOnExit(f)
    f.getAbsolutePath
  }

  private def plant(baseDir: String, name: String, ageMs: Long): Unit = {
    val d = Paths.get(baseDir, name)
    Files.createDirectories(d)
    Files.write(d.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    val t = FileTime.fromMillis(System.currentTimeMillis() - ageMs)
    Files.setLastModifiedTime(d.resolve("part-0.parquet"), t)
    Files.setLastModifiedTime(d, t)
  }

  test("delta truncate sweeps only STALE .stage_d_* dirs") {
    import spark.implicits._
    val root = freshRoot("delta")
    DeltaChain.create(root, Seq((1L, 10L)).toDF("k", "n"), Seq("k"),
      checkpointEvery = 2)
    DeltaChain.commitDelta(spark, root, Seq((1L, 11L)).toDF("k", "n")) // v2
    DeltaChain.commitDelta(spark, root, Seq((1L, 12L)).toDF("k", "n")) // v3+cp
    plant(root, ".stage_d_deadbeef", ageMs = 48L * 3600 * 1000) // kill -9 orphan
    plant(root, ".stage_d_live1234", ageMs = 0)                 // live writer
    DeltaChain.truncate(root, keepFrom = 3)
    assert(!Files.exists(Paths.get(root, ".stage_d_deadbeef")),
      "stale staging dir survived the janitor")
    assert(Files.exists(Paths.get(root, ".stage_d_live1234")),
      "the age gate must protect a live writer's staging")
    // the table still reads
    assert(DeltaChain.read(spark, root).count() === 1L)
  }

  test("snapshot expire sweeps only STALE .stage_* dirs") {
    import spark.implicits._
    val root = freshRoot("snap")
    VersionedTable.create(root, Seq((1L, 10L)).toDF("k", "n"))
    VersionedTable.commitNext(spark, root, Seq((1L, 11L)).toDF("k", "n"))
    plant(root, ".stage_cafe0000", ageMs = 48L * 3600 * 1000)
    plant(root, ".stage_fresh000", ageMs = 0)
    VersionedTable.expire(root, keepFrom = 2)
    assert(!Files.exists(Paths.get(root, ".stage_cafe0000")))
    assert(Files.exists(Paths.get(root, ".stage_fresh000")))
    assert(VersionedTable.read(spark, root).count() === 1L)
  }
}
