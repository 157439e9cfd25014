package graft

import org.apache.spark.sql.functions._
import graft.queries.SurfaceR10cq

class SurfaceR10cqSpec extends SparkSpec {

  test("every R10cq query runs at sf0.001") {
    SurfaceR10cq.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name failed")
    }
  }

  test("t23: the metadata log hides the orphan a naive listing would double-count") {
    val base = java.nio.file.Files.createTempDirectory("graft_t23s_").toString
    try {
      val landing = s"$base/landing"
      val outP = s"$base/sink"
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"),
          floor(col("value") * 1e4 + 0.5).cast("long").as("v4"))
        .repartition(4).write.mode("append").parquet(landing)
      SurfaceR10cq.drainToFileSink(spark, landing, s"$base/ckpt", outP)
      val total = Tables.events(spark, sfDir).count()
      assert(spark.read.parquet(outP).count() == total)
      // plant an orphan; a raw file-glob read double-counts it, the
      // metadata-aware read does not
      val committed = new java.io.File(outP).listFiles()
        .filter(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith("_"))
      java.nio.file.Files.copy(committed.head.toPath,
        new java.io.File(outP, "part-99999-orphan.snappy.parquet").toPath)
      val naive = spark.read.parquet(
        new java.io.File(outP).listFiles()
          .filter(f => f.getName.endsWith(".parquet") &&
            !f.getName.startsWith("_")).map(_.getPath): _*).count()
      assert(naive > total, s"naive=$naive total=$total")
      assert(spark.read.parquet(outP).count() == total,
        "metadata-aware read must ignore the orphan")
    } finally {
      QueryGuard.deleteRec(new java.io.File(base))
    }
  }

  test("t24: consumed landing files move to the archive; nothing is lost") {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_t24s_").toString
    try {
      val landing = s"$base/landing"
      val arch = s"$base/archive"
      val ev = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"))
      ev.repartition(6).write.mode("append").parquet(landing)
      def names(dir: java.io.File): Set[String] =
        if (!dir.exists()) Set.empty
        else {
          val (dirs, files) = dir.listFiles().partition(_.isDirectory)
          files.filter(f => f.getName.endsWith(".parquet") &&
            !f.getName.startsWith("_") && !f.getName.startsWith("."))
            .map(_.getName).toSet ++ dirs.flatMap(names)
        }
      val before = names(new java.io.File(landing))
      val q = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .option("cleanSource", "archive")
        .option("sourceArchiveDir", arch)
        .parquet(landing)
        .writeStream.format("noop").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(180000L))
      val after = names(new java.io.File(landing))
      val archived = names(new java.io.File(arch))
      assert(archived.nonEmpty, "no file was archived")
      assert(archived.intersect(after).isEmpty)
      assert(archived ++ after == before,
        s"lost files: ${(before -- archived -- after).take(3)}")
    } finally {
      QueryGuard.deleteRec(new java.io.File(base))
    }
  }
}
