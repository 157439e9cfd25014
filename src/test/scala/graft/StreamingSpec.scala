package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingOps

class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("T4: watermark drops late data across micro-batches (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val windowed = source.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("start"), col("event_type"), col("n"))
    val q = windowed.writeStream.format("memory")
      .queryName("t4_test_sink").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two on-time events in [10:00, 10:10)
      source.addData((ts("2024-01-01 10:01:00"), "a"), (ts("2024-01-01 10:02:00"), "a"))
      q.processAllAvailable()
      // batch 2: advance watermark far past the first window
      source.addData((ts("2024-01-01 11:00:00"), "a"))
      q.processAllAvailable()
      // batch 3: a LATE event for the long-closed 10:00 window + a flusher
      source.addData((ts("2024-01-01 10:03:00"), "late"), (ts("2024-01-01 12:00:00"), "a"))
      q.processAllAvailable()
      source.addData((ts("2024-01-01 13:00:00"), "a"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("t4_test_sink")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    assert(rows.contains(("2024-01-01 10:00:00.0", "a", 2L)), s"got ${rows.toSeq}")
    assert(!rows.exists(_._2 == "late"), s"late row leaked: ${rows.toSeq}")
  }

  test("T2 streaming: sliding windows overlap correctly and drop late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, String)]
    val windowed = StreamingOps.slidingCounts(
      source.toDF().toDF("ts", "event_type"),
      windowDur = "10 minutes", slide = "5 minutes", watermark = "10 minutes")
    val q = windowed.writeStream.format("memory")
      .queryName("t2_test_sink").outputMode(OutputMode.Append()).start()
    try {
      // 10:01 → windows [09:55,10:05) and [10:00,10:10)
      // 10:07 → windows [10:00,10:10) and [10:05,10:15)
      source.addData((ts("2024-01-01 10:01:00"), "a"), (ts("2024-01-01 10:07:00"), "a"))
      q.processAllAvailable()
      // advance the watermark far past all three windows
      source.addData((ts("2024-01-01 11:00:00"), "a"))
      q.processAllAvailable()
      // a late event for the long-closed [10:00,10:10) + a flusher
      source.addData((ts("2024-01-01 10:06:00"), "late"), (ts("2024-01-01 12:00:00"), "a"))
      q.processAllAvailable()
      source.addData((ts("2024-01-01 13:00:00"), "a"))
      q.processAllAvailable()
    } finally q.stop()
    def epoch(s: String) = ts(s).getTime / 1000
    val rows = spark.table("t2_test_sink")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows.contains((epoch("2024-01-01 09:55:00"), "a", 1L)), rows.toString)
    assert(rows.contains((epoch("2024-01-01 10:00:00"), "a", 2L)), rows.toString)
    assert(rows.contains((epoch("2024-01-01 10:05:00"), "a", 1L)), rows.toString)
    assert(!rows.exists(_._2 == "late"), s"late row leaked: $rows")
  }

  test("T3 streaming: session_window closes sessions as the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, Long)]
    val sessions = source.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"))
    val q = sessions.writeStream.format("memory")
      .queryName("t3s_test_sink").outputMode(OutputMode.Append()).start()
    try {
      // two events 2 min apart -> one session for user 7
      source.addData((ts("2024-01-01 10:00:00"), 7L), (ts("2024-01-01 10:02:00"), 7L))
      q.processAllAvailable()
      // advance the watermark far past session end + gap -> session emits
      source.addData((ts("2024-01-01 11:00:00"), 8L))
      q.processAllAvailable()
      source.addData((ts("2024-01-01 12:00:00"), 8L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("t3s_test_sink").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.contains((7L, 2L)), s"user 7's closed session missing: ${rows.toSeq}")
  }

  test("T6b: transformWithState accumulates per-key counts (RocksDB state store)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val source = MemoryStream[Long]
    val counted = StreamingOps.runningUserCountsTWS(
      source.toDF().toDF("user_id"))
    val q = counted.writeStream.format("memory")
      .queryName("t6b_test_sink").outputMode(OutputMode.Update()).start()
    try {
      source.addData(1L, 1L, 2L)
      q.processAllAvailable()
      source.addData(1L, 2L, 2L)
      q.processAllAvailable()
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    // Update-mode sink keeps one row per (key, batch); the LAST row per
    // key carries the running total.
    val last = spark.table("t6b_test_sink").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    assert(last == Map(1L -> 3L, 2L -> 3L), s"got $last")
  }

  test("T5: dropDuplicatesWithinWatermark dedups repeated keys across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Timestamp, Long)]
    val deduped = source.toDF().toDF("ts", "id")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.format("memory")
      .queryName("t5_test_sink").outputMode(OutputMode.Append()).start()
    try {
      source.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:01:00"), 2L))
      q.processAllAvailable()
      source.addData((ts("2024-01-01 10:05:00"), 1L)) // duplicate within watermark
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("t5_test_sink").count() == 2)
  }

  test("T6: flatMapGroupsWithState accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[Long]
    val counts = StreamingOps.runningUserCounts(source.toDF().toDF("user_id"))
    val q = counts.writeStream.format("memory")
      .queryName("t6_test_sink").outputMode(OutputMode.Update()).start()
    try {
      source.addData(1L, 1L, 2L)
      q.processAllAvailable()
      source.addData(1L, 2L)
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("t6_test_sink")
      .groupBy("user_id").agg(max("n_events").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(last == Map(1L -> 3L, 2L -> 2L))
  }

  test("T7/T8: stream-static join and parquet sink round-trip") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "base")).toDF("id", "tier")
    val source = MemoryStream[Long]
    val joined = source.toDF().toDF("uid")
      .join(dim, col("uid") === col("id"))
      .select("uid", "tier")
    val outDir = new java.io.File("target/tmp/t8_parquet_sink").getAbsolutePath
    val ckDir = new java.io.File("target/tmp/t8_ck").getAbsolutePath
    val q = joined.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .outputMode(OutputMode.Append()).start()
    try {
      source.addData(1L, 2L, 1L)
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.parquet(outDir)
    assert(back.count() == 3)
    assert(back.where(col("tier") === "gold").count() == 2)
  }

  test("T14: event-time timer closes an idle session with NO further event for that key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val source = MemoryStream[(Timestamp, Long)]
    val sessions = StreamingOps.sessionCloseTimers(
      source.toDF().toDF("ts", "user_id"))
    val q = sessions.writeStream.format("memory")
      .queryName("t14_test_sink").outputMode(OutputMode.Update()).start()
    try {
      // user 7's session [10:00, 10:02]; timer registered at 10:12
      source.addData((ts("2024-01-01 10:00:00"), 7L), (ts("2024-01-01 10:02:00"), 7L))
      q.processAllAvailable()
      // ONLY user 8 speaks; watermark -> 10:25 > 10:12, so user 7's
      // timer fires even though user 7 never produced another event
      source.addData((ts("2024-01-01 10:30:00"), 8L))
      q.processAllAvailable()
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    def epoch(s: String) = ts(s).getTime / 1000
    val rows = spark.table("t14_test_sink").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set((7L, epoch("2024-01-01 10:00:00"),
      epoch("2024-01-01 10:02:00"), 2L)),
      s"expected only user 7's timer-closed session, got $rows")
  }

  test("streaming query registry entries run end-to-end at sf0.001") {
    graft.queries.StreamingQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }
}
