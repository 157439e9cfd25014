package graft

import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Crash-recovery failure injection for stateful streaming (VERDICT
  * r12 item 5): t22 proves a CLEAN checkpoint restart; this spec kills
  * a RocksDB-backed transformWithState query MID-BATCH — after the
  * batch's state updates have been computed and a PARTIAL sink write
  * has landed, but before the sink commit — then restarts from the
  * same checkpoint and proves exactly-once per-key state:
  *
  *  - the failed batch is REDELIVERED on restart (same batchId, the
  *    replay the commit log mandates), observed by the sink;
  *  - the per-batchId overwrite sink (the t18 ledger discipline) heals
  *    the partial write, so the final ledger carries each user's exact
  *    running count — a state store that re-applied the replayed batch
  *    on top of already-committed state would read HIGH, one that lost
  *    the uncommitted attempt's lineage would read LOW; both fail the
  *    exact-equality check against the batch-mode truth.
  */
class StreamingCrashRecoverySpec extends SparkSpec {

  test("t6b RocksDB query killed mid-batch recovers to exact per-user counts") {
    crashRecoveryScenario(Map.empty)
  }

  test("t6b recovery holds under RocksDB CHANGELOG checkpointing") {
    // changelog mode uploads per-batch deltas instead of full RocksDB
    // snapshots — faster commits, but recovery must REPLAY the
    // changelog onto the last snapshot, which is exactly the path a
    // mid-batch kill stresses (an unflushed changelog for the failed
    // attempt must not be applied twice)
    crashRecoveryScenario(Map(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        -> "true"))
  }

  private def crashRecoveryScenario(extraConfs: Map[String, String]): Unit = {
    val s = spark
    val prevExtra = extraConfs.keys.map(k => k -> s.conf.getOption(k)).toSeq
    extraConfs.foreach { case (k, v) => s.conf.set(k, v) }
    try crashRecoveryBody(s)
    finally prevExtra.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  private def crashRecoveryBody(s: org.apache.spark.sql.SparkSession): Unit = {
    val base = java.nio.file.Files.createTempDirectory("graft_crash_").toString
    QueryGuard.deleteRecOnExit(new java.io.File(base))
    val landing = s"$base/landing"
    val ck = s"$base/ckpt"
    val ledger = s"$base/ledger"

    val ev = Tables.events(s, sfDir).select(col("event_id"), col("user_id"))
    // four deterministic landing files → four micro-batches at
    // maxFilesPerTrigger=1; the kill targets batch 2 (mid-stream)
    (0 to 3).foreach { i =>
      ev.where(col("event_id") % 4 === i).coalesce(1)
        .write.mode("append").parquet(landing)
    }

    val prevProvider = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val poison = new AtomicBoolean(true)
      val batchesSeen = mutable.ArrayBuffer.empty[Long]

      def drive(): Option[Throwable] = {
        val src = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "1").parquet(landing)
        val counts = streaming.StreamingOps.runningUserCountsTWS(src)
        val q = counts.writeStream
          .outputMode("update")
          .option("checkpointLocation", ck)
          .foreachBatch { (b: DataFrame, batchId: Long) =>
            batchesSeen.synchronized { batchesSeen += batchId }
            if (batchId == 2 && poison.get()) {
              // partial, non-atomic write THEN die: the half-written
              // batch dir is exactly what a sink crash leaves behind
              b.limit(3).write.mode("overwrite").parquet(s"$ledger/batch=$batchId")
              poison.set(false)
              throw new RuntimeException("injected mid-batch crash")
            }
            b.write.mode("overwrite").parquet(s"$ledger/batch=$batchId")
          }
          .trigger(Trigger.AvailableNow()).start()
        try { q.awaitTermination(180000L); None }
        catch { case e: Throwable => Some(e) }
        finally if (q.isActive) q.stop()
      }

      // run 1: must die on the injected fault at batch 2
      val err = drive()
      assert(err.isDefined, "injected crash did not surface")
      assert(err.get.getMessage != null || err.get.getCause != null)
      val seenFirst = batchesSeen.toList
      assert(seenFirst.contains(2L), s"kill batch never ran: $seenFirst")

      // run 2: same checkpoint — must replay batch 2, then finish
      batchesSeen.clear()
      val err2 = drive()
      assert(err2.isEmpty, s"restart failed: ${err2.map(_.toString)}")
      val seenSecond = batchesSeen.toList
      assert(seenSecond.contains(2L),
        s"failed batch was not redelivered on restart: $seenSecond")
      assert(!seenSecond.contains(0L) && !seenSecond.contains(1L),
        s"restart reprocessed committed batches: $seenSecond")

      // exactly-once: final per-user count (latest batch that touched
      // the user) must equal the batch-mode truth — no loss, no double
      val truth = ev.groupBy("user_id").agg(count(lit(1)).as("n_true"))
      val led = s.read.parquet(ledger)
        .select(col("batch"), col("user_id"), col("n_events"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("batch").desc)
      val finalCounts = led
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("user_id"), col("n_events"))
      val bad = finalCounts.join(truth, "user_id")
        .where(col("n_events") =!= col("n_true"))
      assert(bad.count() === 0,
        s"per-user counts diverged: ${bad.limit(5).collect().mkString(";")}")
      assert(finalCounts.count() === truth.count())
    } finally {
      prevProvider match {
        case Some(p) => s.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
