package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming operators (SURVEY.md §2.9 T4–T8).
  *
  * Batch/stream parity is the design rule: the transformations here are
  * the same Column expressions the batch queries use — `readStream`
  * swaps the source, watermarks bound state, and the micro-batch engine
  * handles increments. Tests drive multi-batch semantics (late-data
  * drops, stateful accumulation) through MemoryStream; the query-registry
  * entries run the file source to completion and return the sink table so
  * the driver harness can treat them as batch results.
  *
  * Scale: stateful operators keep per-key state in the state store
  * (RocksDB provider in production); watermarks are what bound that
  * state — every stateful op here requires one.
  */
object StreamingOps {

  /** Explicit schema: streaming sources never infer. `ts` has shipped as
    * INT64 nanos or TIMESTAMP(MICROS) across fixture generations (see
    * Tables.events), so the physical ts type is taken from the file
    * footer via a driver-side batch schema probe. */
  def eventsSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source streaming read of the events fixture. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    // glob pattern (not a bare file path): FileStreamSource injects a
    // file-valued basePath for non-glob paths, which the file index
    // rejects with "Option 'basePath' must be a directory"
    val raw = spark.readStream
      .schema(eventsSchema(tsType))
      .parquet(s"$dir/events.parquet*")
    tsType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** T1/T4 streaming: watermarked tumbling-window counts. */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("n_events"))

  /** T11: streaming SESSION windows — state is one open session per
    * (user, gap-chain), merged when a late event bridges two sessions;
    * complete mode keeps the full history so the single-batch fixture
    * run is deterministic and matches the batch t3 oracle exactly.
    * Session bounds are reported from the EVENTS (min/max ts), not the
    * gap-padded window end, so batch and streaming agree. */
  def sessionCounts(events: DataFrame, gap: String = "10 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("sess_start_us"),
        unix_micros(max(col("ts"))).as("sess_end_us"))
      .select("user_id", "sess_start_us", "sess_end_us", "n_events")

  /** T2 streaming: watermarked SLIDING-window counts — each event lands
    * in window/slide overlapping windows; state for a window is evicted
    * once the watermark passes its end, exactly as in the tumbling case
    * (the overlap multiplies state size by window/slide, not by stream
    * length, so it stays bounded). */
  def slidingCounts(events: DataFrame, windowDur: String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("n_events"))

  /** T13: CHAINED stateful aggregations in one streaming query (Spark
    * 4 multi-stateful-operator support): a 15-minute tumbling count per
    * type re-aggregated into 1-hour totals, both windows event-time and
    * append-mode. `window_time` re-derives an event-time column from the
    * first window so the second agg windows on event time, not
    * processing time. At scale this is the pre-aggregation ladder —
    * fine-grain state stays small and the coarse rollup reads already
    * reduced rows instead of raw events (state ∝ open windows, not
    * stream length). A 1 h window emits only once the watermark passes
    * its end, at which point every constituent 15 min window has
    * necessarily been finalized — no partial rollups can emit. */
  def chainedWindowCounts(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n15"))
      .groupBy(window(window_time(col("window")), "1 hour"), col("event_type"))
      .agg(sum(col("n15")).as("n_events"))
      .select(
        unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("n_events"))

  /** T5: streaming dedup by key within the watermark horizon.
    * `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`) so the
    * per-key dedup state is evicted once the watermark passes — plain
    * dropDuplicates on a non-event-time key keeps state forever and
    * OOMs on an unbounded stream. */
  def dedupCountsByType(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_unique"))

  /** T6: arbitrary stateful processing — running per-user event count
    * via flatMapGroupsWithState. */
  def runningUserCounts(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").as[Long])
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (user, rows, state) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((user, n))
      }
      .toDF("user_id", "n_events")
  }

  /** T6b: the same running per-user count via the Spark 4.x
    * `transformWithState` StatefulProcessor API — typed named state with
    * optional TTL, RocksDB-backed (the state-store provider must be
    * RocksDBStateStoreProvider; HDFS-backed stores reject this operator).
    * At scale this is the preferred stateful primitive: state lives off
    * the JVM heap and TTL bounds it without watermark gymnastics. */
  class RunningCountProcessor extends StatefulProcessor[Long, Long, (Long, Long)] {
    @transient private var countState: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      countState = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(
        key: Long, rows: Iterator[Long], timerValues: TimerValues): Iterator[(Long, Long)] = {
      val n = (if (countState.exists()) countState.get() else 0L) + rows.size
      countState.update(n)
      Iterator((key, n))
    }
  }

  /** T14: EVENT-TIME TIMERS — sessionization where the CLOSE of a
    * session is detected by a timer, not by a subsequent event: each
    * user's open session registers a timer at (last event + gap); when
    * the watermark passes it, `handleExpiredTimer` emits the session and
    * clears state. This is the idle-timeout pattern (cart abandonment,
    * connection expiry) that plain windowing can't express: the emission
    * is triggered by the ABSENCE of events. Sessions closed by a later
    * event in the same batch emit from `handleInputRows` directly.
    * State per user = one open session + one timer, bounded by the
    * watermark — the 100 TB posture is the same as T6 (RocksDB store,
    * key-partitioned shuffle, no driver state). Timestamps are
    * second-truncated on both engine sides so the ms-granular timer
    * comparison can't straddle a fractional boundary the SQL oracle
    * computes exactly. */
  class SessionCloseProcessor(gapSec: Long)
      extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long, Long)] {
    // open session: (start_s, end_s, n_events)
    @transient private var open: ValueState[(Long, Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[(Long, Long, Long)](
        "open", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
      val ts = rows.map(_._2).toArray.sorted
      var out = List.empty[(Long, Long, Long, Long)]
      var cur = if (open.exists()) Some(open.get()) else None
      ts.foreach { t =>
        cur = cur match {
          case Some((s0, e0, n0)) if t - e0 < gapSec => Some((s0, t, n0 + 1))
          case Some((s0, e0, n0)) =>
            out ::= ((key, s0, e0, n0)); Some((t, t, 1L))
          case None => Some((t, t, 1L))
        }
      }
      val (s0, e0, n0) = cur.get
      open.update((s0, e0, n0))
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer((e0 + gapSec) * 1000L)
      out.reverse.iterator
    }
    override def handleExpiredTimer(
        key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] =
      if (open.exists()) {
        val (s0, e0, n0) = open.get()
        open.clear()
        Iterator((key, s0, e0, n0))
      } else Iterator.empty
  }

  def sessionCloseTimers(events: DataFrame, gapSec: Long = 600L,
      watermark: String = "5 minutes"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("ts", date_trunc("second", col("ts")))
      .withWatermark("ts", watermark)
      .select(col("user_id").as[Long], unix_timestamp(col("ts")).as[Long])
      .groupByKey(_._1)
      .transformWithState(new SessionCloseProcessor(gapSec),
        TimeMode.EventTime(), OutputMode.Update())
      .toDF("user_id", "sess_start_s", "sess_end_s", "n_events")
  }

  def runningUserCountsTWS(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").as[Long])
      .groupByKey(identity)
      .transformWithState(new RunningCountProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events")
  }

  /** T7: stream–static enrichment join + aggregation. */
  def enrichedSegmentCounts(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .join(customer, col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), graft.Orc.r4(sum("value")).as("sum_value"))

  /** T9: stream–stream inner join — purchases matched to the clicks they
    * follow within `horizon`, both sides watermarked so the engine can
    * discard buffered state once the event-time bound passes. The time
    * range in the join condition is MANDATORY for state cleanup; an
    * unconstrained stream–stream join buffers both streams forever. */
  def clickToPurchaseJoin(events: DataFrame, horizon: String = "1 hour"): DataFrame = {
    val clicks = events
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", horizon)
    val purchases = events
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("purchase_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", horizon)
    clicks.join(
      purchases,
      col("click_user") === col("purchase_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"))
      .select(col("click_user").as("user_id"), col("click_id"), col("purchase_id"),
        unix_micros(col("click_ts")).as("click_ts_us"),
        unix_micros(col("purchase_ts")).as("purchase_ts_us"))
  }

  /** T12: watermarked stream-stream LEFT OUTER join — same key + time-range
    * condition as [[clickToPurchaseJoin]], but clicks with no purchase in
    * the hour emit a null-extended row once the watermark passes their
    * join window (i.e. the state-eviction point). Unmatched clicks whose
    * window the final watermark never passes stay unemitted — that is the
    * streaming contract, and the oracle reproduces it with the same
    * cutoff. */
  def clickToPurchaseLeftOuter(events: DataFrame, horizon: String = "1 hour"): DataFrame = {
    val clicks = events
      .where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", horizon)
    val purchases = events
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("purchase_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", horizon)
    clicks.join(
      purchases,
      col("click_user") === col("purchase_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"),
      "left_outer")
      .select(col("click_user").as("user_id"), col("click_id"), col("purchase_id"),
        unix_micros(col("click_ts")).as("click_ts_us"),
        unix_micros(col("purchase_ts")).as("purchase_ts_us"))
  }

  /** T8: run a streaming frame into a named memory sink until the source
    * is exhausted, then return the sink table (batch DataFrame). */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    df.sparkSession.table(name)
  }

  /** [[runToMemory]] plus the run's state-store cost drivers, aggregated
    * from the query's own progress events (VERDICT r13 item 1: the
    * rocksdb bench probe was the one out-of-band number with no work
    * counter attached — a reading with its state rows, checkpoint
    * bytes, and commit time in hand is self-adjudicating; one without
    * is a coin flip between host load and a real regression).
    *
    * Fields are LONG key/value pairs ready for the bench's probe_diag:
    *  - n_batches: progress events observed (microbatches executed)
    *  - state_rows_total: keys resident in the store after the LAST batch
    *  - state_rows_updated / state_rows_removed: committed row churn,
    *    summed across batches — the "state rows committed" driver
    *  - state_commit_ms / state_update_ms: per-batch store commit and
    *    update wall, summed — where checkpointing cost shows up
    *  - state_mem_mb: provider-reported memory after the last batch
    *  - plus each whitelisted provider custom metric, summed (for
    *    RocksDB: bytes/files copied into the checkpoint, SST bytes
    *    loaded back, compaction latencies) — absent metrics emit 0 so
    *    the JSON shape is stable across providers.
    *
    * Progress retention: recentProgress keeps the last
    * `spark.sql.streaming.numRecentProgressUpdates` (default 100)
    * entries — the fixture drive runs single-digit microbatches, so
    * nothing is dropped. */
  def runToMemoryDiag(
      df: DataFrame,
      name: String,
      mode: OutputMode): (DataFrame, Seq[(String, Long)]) = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val progs = q.recentProgress.toSeq
    val ops = progs.flatMap(_.stateOperators.toSeq)
    val lastOps = progs.lastOption.map(_.stateOperators.toSeq).getOrElse(Seq.empty)
    val custom = scala.collection.mutable.Map.empty[String, Long]
    ops.foreach { op =>
      op.customMetrics.forEach((k, v) => custom(k) = custom.getOrElse(k, 0L) + v)
    }
    // RocksDBStateStoreProvider metric names (Spark's published
    // provider metrics): checkpoint upload (FilesCopied/BytesCopied,
    // FilesReused), load-side reads, and commit-phase latencies.
    val whitelist = Seq(
      "rocksdbFilesCopied" -> "rdb_files_copied",
      "rocksdbBytesCopied" -> "rdb_bytes_copied",
      "rocksdbFilesReused" -> "rdb_files_reused",
      "rocksdbSstFileSize" -> "rdb_sst_bytes",
      "rocksdbCommitFlushLatency" -> "rdb_flush_ms",
      "rocksdbCommitCompactLatency" -> "rdb_compact_ms",
      "rocksdbCommitCheckpointLatency" -> "rdb_checkpoint_ms",
      "rocksdbCommitFileSyncLatencyMs" -> "rdb_filesync_ms")
    val fields = Seq(
      "n_batches" -> progs.size.toLong,
      "state_rows_total" -> lastOps.map(_.numRowsTotal).sum,
      "state_rows_updated" -> ops.map(_.numRowsUpdated).sum,
      "state_rows_removed" -> ops.map(_.numRowsRemoved).sum,
      "state_commit_ms" -> ops.map(_.commitTimeMs).sum,
      "state_update_ms" -> ops.map(_.allUpdatesTimeMs).sum,
      "state_mem_mb" -> lastOps.map(_.memoryUsedBytes).sum / (1L << 20)) ++
      whitelist.map { case (metric, field) =>
        field -> custom.getOrElse(metric, 0L)
      }
    (df.sparkSession.table(name), fields)
  }
}
