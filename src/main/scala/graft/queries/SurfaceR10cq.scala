package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 95: the streaming parquet FILE sink with its
  * `_spark_metadata` exactly-once read contract, and FileStreamSource
  * archival (`cleanSource`) — the two halves of a production file
  * lifecycle no memory-sink entry exercises.
  *
  * Contrast with near-siblings: t8 lands an append stream in a MEMORY
  * sink (result semantics only); t18/t22 prove ledger/checkpoint
  * recovery for foreachBatch sinks. t23 is the FILE sink: committed
  * files are recorded in the sink's `_spark_metadata` transaction log,
  * and a log-aware read returns exactly the committed rows even when
  * the directory also holds an orphan file from a failed/duplicate
  * attempt — the query PLANTS such an orphan and the oracle equality
  * is the exactly-once proof (a naive directory listing would
  * double-count; the spec shows exactly that). t24 drives the intake
  * side: `cleanSource=archive` moves fully-processed input files to an
  * archive dir so a landing zone cannot re-grow unbounded; the spec
  * asserts the file movement, the registry row pins the totals.
  *
  * Float discipline: pure integer counts plus the t18-idiom quantized
  * value sum; nothing else.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.11 (streaming sinks/sources); siblings t8/t18/t22
  * (StreamingQueries, SurfaceR8, SurfaceR10ck).
  */
object SurfaceR10cq extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private[graft] def drainToFileSink(s: SparkSession, landing: String,
      ck: String, outP: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    val ev = s.read.parquet(landing)
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "2").parquet(landing)
      .writeStream.format("parquet")
      .option("path", outP).option("checkpointLocation", ck)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    if (!q.awaitTermination(180000L)) { q.stop(); sys.error("t23 drain expired") }
  }

  /** T23: PARQUET FILE SINK — land the event stream in a parquet file
    * sink, then PLANT an orphan part-file (a byte-copy of a committed
    * file, as a crashed task attempt would leave) and read the sink
    * back. The metadata-log-aware read ignores the orphan, so the
    * per-type counts and quantized value sums still equal the batch
    * oracle — the file sink's exactly-once read contract, exercised
    * end to end. */
  val t23FileSink: Q = (s, d) => {
    val base = java.nio.file.Files.createTempDirectory("graft_t23_").toString
    graft.QueryGuard.deleteRecOnExit(new java.io.File(base))
    val landing = s"$base/landing"
    val outP = s"$base/sink"
    Tables.events(s, d).select(col("event_id"), col("event_type"),
        floor(col("value") * 1e4 + 0.5).cast("long").as("v4"))
      .repartition(4).write.mode("append").parquet(landing)
    drainToFileSink(s, landing, s"$base/ckpt", outP)
    // plant the orphan: duplicate one committed data file under a name
    // the sink never committed
    val committed = new java.io.File(outP).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    java.nio.file.Files.copy(committed.head.toPath,
      new java.io.File(outP, "part-99999-orphan.snappy.parquet").toPath)
    val out = s.read.parquet(outP) // _spark_metadata-aware listing
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("v4").as("sv4"))
      .select(col("event_type"), col("n_events"),
        Orc.r4(col("sv4") / 10000.0).as("sum_value4"))
      .orderBy("event_type").localCheckpoint(true)
    graft.QueryGuard.deleteRec(new java.io.File(base))
    out
  }

  /** T24: SOURCE ARCHIVAL — consume a multi-file landing zone with
    * `cleanSource=archive`: files whose batch has committed are moved
    * under the archive dir by later batches, so the landing zone
    * drains instead of re-growing. Registry row = the consumed totals
    * (oracle-checked); the spec asserts the actual file movement and
    * that archived ∪ remaining = the original landing set. */
  val t24SourceArchive: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_t24_").toString
    graft.QueryGuard.deleteRecOnExit(new java.io.File(base))
    val landing = s"$base/landing"
    val arch = s"$base/archive"
    val ev = Tables.events(s, d).select(col("event_id"), col("event_type"),
      floor(col("value") * 1e4 + 0.5).cast("long").as("v4"))
    ev.repartition(6).write.mode("append").parquet(landing)
    val sink = s"t24_${java.util.UUID.randomUUID().toString.take(8)}"
    val q = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .option("cleanSource", "archive")
      .option("sourceArchiveDir", arch)
      .parquet(landing)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("v4").as("sv4"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    if (!q.awaitTermination(180000L)) { q.stop(); sys.error("t24 drain expired") }
    val rows = s.table(sink)
      .select(col("event_type"), col("n_events"),
        Orc.r4(col("sv4") / 10000.0).as("sum_value4"))
      .orderBy("event_type").collect().toSeq
    val schema = s.table(sink).schema match {
      case st => org.apache.spark.sql.types.StructType(Seq(
        st("event_type"), st("n_events"),
        org.apache.spark.sql.types.StructField("sum_value4",
          org.apache.spark.sql.types.DoubleType)))
    }
    s.catalog.dropTempView(sink)
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
      .orderBy("event_type")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "t23_file_sink" -> t23FileSink,
    "t24_source_archive" -> t24SourceArchive)

  private val evAggSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  round(CAST(sum(CAST(floor(value * 1e4 + 0.5) AS BIGINT)) AS DOUBLE)
      |    / 10000.0, 4) AS sum_value4
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "t23_file_sink" -> evAggSql,
    "t24_source_archive" -> evAggSql)
}
