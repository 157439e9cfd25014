package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 89: rendezvous (highest-random-weight)
  * sharding with an elastic-rescale audit, and a streaming
  * checkpoint-restart recovery drive.
  *
  * Contrast with near-siblings: lp6's shard manifest uses static
  * hash-mod assignment — correct until the shard count changes, at
  * which point mod resharding moves ~(N−1)/N of all keys; rendezvous
  * hashing assigns each doc to argmax_s md5(doc∥s) so growing N→N+1
  * moves ONLY the docs whose new argmax IS the new shard (≈1/(N+1)),
  * and the audit readout proves it: every pre-existing shard's
  * arrival count is exactly zero. t18 replays an already-seen batch
  * into a foreachBatch ledger (exactly-once WRITE semantics); t22
  * exercises the other half of recovery — a second, fresh query
  * resumes from the first query's checkpointLocation, reads ONLY the
  * files landed after the stop, and still reports totals over the
  * full input because the state store was recovered.
  *
  * Float discipline: both queries are pure integer counting on
  * deterministic md5 order; no doubles anywhere but t22's quantized
  * value sum (1e-4 integer cents, the t18 idiom).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.10 (sharding/layout) and §2.11 (streaming recovery);
  * siblings lp6 (PipelineOps), t16/t18 (SurfaceR6l/R8).
  */
object SurfaceR10ck extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val N0 = 8 // shards before the rescale; N0+1 after

  /** LP68: RENDEZVOUS SHARDING — per shard: population under N0
    * shards, population under N0+1, and how many docs ARRIVED (were
    * assigned elsewhere before). The HRW invariant says arrivals are 0
    * everywhere except the new shard — minimal movement under rescale,
    * which static mod sharding cannot offer.
    *
    * Scale shape: docs × (N0+1) shard names is a constant-factor
    * explode; both argmaxes ride one window partitioned BY DOC (9-row
    * partitions — never global); readout is a #shards-row agg.
    */
  val lp68RendezvousSharding: Q = (s, d) => {
    val shards = (0 to N0).map(i => s"shard$i")
    val w = documents(s, d).select(col("doc_id"))
      .crossJoin(broadcast(
        s.range(1).select(explode(array(shards.map(lit): _*)).as("shard"))))
      .select(col("doc_id"), col("shard"),
        md5(concat_ws(":", col("doc_id"), col("shard")).cast("binary"))
          .as("hv"))
    def assign(nShards: Int, outCol: String): DataFrame = {
      val win = Window.partitionBy("doc_id")
        .orderBy(col("hv").desc, col("shard").asc)
      w.where(col("shard") =!= s"shard$N0" || lit(nShards > N0))
        .withColumn("rn", row_number().over(win))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("shard").as(outCol))
    }
    val before = assign(N0, "s0")
    val after = assign(N0 + 1, "s1")
    val both = before.join(after, "doc_id")
    both.groupBy(col("s1").as("shard"))
      .agg(count(lit(1)).as("n_after"),
        sum(when(col("s0") =!= col("s1"), 1L).otherwise(0L)).as("n_arrived"))
      .join(both.groupBy(col("s0").as("shard"))
        .agg(count(lit(1)).as("n_before")), Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("n_arrived"), lit(0L)).as("n_arrived"))
      .orderBy("shard")
  }

  /** T22: CHECKPOINT RESTART — drive the same watermark-free complete
    * aggregation through TWO queries sharing one checkpointLocation:
    * query 1 drains the first half of the landing files and stops;
    * the second half lands; query 2 resumes from the checkpoint,
    * processes ONLY the new files (the offset log proves the first
    * half is committed), and its complete-mode table still carries
    * full-input totals because the state store was recovered. Readout
    * = per-type counts and the 1e-4-quantized value sum over ALL
    * events — any recovery hole (reprocessed or dropped files, lost
    * state) shifts the exact integers and fails the oracle.
    */
  val t22CheckpointRestart: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory(s"graft_t22_").toString
    graft.QueryGuard.deleteRecOnExit(new java.io.File(base))
    val landing = s"$base/landing"
    val ck = s"$base/ckpt" // shared by BOTH queries — the thing under test
    val outP = s"$base/out" // complete-mode table, last batch wins
    val ev = Tables.events(s, d).select(col("event_id"), col("event_type"),
      floor(col("value") * 1e4 + 0.5).cast("long").as("v4"))

    ev.where(col("event_id") % 2 === 0).repartition(2)
      .write.mode("append").parquet(landing)
    // memory sink refuses checkpoint recovery, so the sink is a
    // foreachBatch parquet overwrite (recovery-capable); batches seen
    // by query 2 are counted to prove it reprocessed nothing.
    val batchesSeen = new java.util.concurrent.atomic.AtomicLong(0L)
    def drain(): Unit = {
      val agg = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(landing)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("v4").as("sv4"))
      val q = agg.writeStream
        .outputMode("complete").option("checkpointLocation", ck)
        .foreachBatch { (b: DataFrame, _: Long) =>
          batchesSeen.incrementAndGet()
          b.write.mode("overwrite").parquet(outP)
        }
        .trigger(Trigger.AvailableNow()).start()
      if (!q.awaitTermination(180000L)) {
        q.stop(); sys.error("t22 drain expired")
      }
    }
    drain()
    // second half lands AFTER the first query is gone
    ev.where(col("event_id") % 2 === 1).repartition(2)
      .write.mode("append").parquet(landing)
    batchesSeen.set(0L)
    drain()
    // 2 new files / maxFilesPerTrigger=1 → exactly 2 batches; any
    // reprocessing of the first half would show up here AND (without
    // recovered state) halve the counts below.
    val b2 = batchesSeen.get()
    if (b2 > 2) sys.error(s"t22: restart reprocessed old files ($b2 batches)")
    val out = s.read.parquet(outP)
      .select(col("event_type"), col("n_events"),
        Orc.r4(col("sv4") / 10000.0).as("sum_value4"))
      .orderBy("event_type").localCheckpoint(true)
    graft.QueryGuard.deleteRec(new java.io.File(s"$base/landing"))
    out
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp68_rendezvous_sharding" -> lp68RendezvousSharding,
    "t22_checkpoint_restart" -> t22CheckpointRestart)

  val oracleSql: Map[String, String] = Map(
    "lp68_rendezvous_sharding" -> {
      val shardList = (0 to N0).map(i => s"'shard$i'").mkString(", ")
      s"""WITH w AS MATERIALIZED (
         |  SELECT doc_id, shard,
         |    md5(CAST(doc_id AS VARCHAR) || ':' || shard) AS hv
         |  FROM documents
         |  CROSS JOIN (SELECT unnest([$shardList]) AS shard)),
         |before AS MATERIALIZED (
         |  SELECT doc_id, shard AS s0 FROM (
         |    SELECT doc_id, shard, row_number() OVER (
         |      PARTITION BY doc_id ORDER BY hv DESC, shard) AS rn
         |    FROM w WHERE shard <> 'shard$N0') WHERE rn = 1),
         |after AS MATERIALIZED (
         |  SELECT doc_id, shard AS s1 FROM (
         |    SELECT doc_id, shard, row_number() OVER (
         |      PARTITION BY doc_id ORDER BY hv DESC, shard) AS rn
         |    FROM w) WHERE rn = 1),
         |pb AS MATERIALIZED (
         |  SELECT before.doc_id, s0, s1 FROM before
         |  JOIN after ON before.doc_id = after.doc_id),
         |aft AS (
         |  SELECT s1 AS shard, CAST(count(*) AS BIGINT) AS n_after,
         |    CAST(sum(CASE WHEN s0 <> s1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_arrived
         |  FROM pb GROUP BY 1),
         |bef AS (
         |  SELECT s0 AS shard, CAST(count(*) AS BIGINT) AS n_before
         |  FROM pb GROUP BY 1)
         |SELECT coalesce(aft.shard, bef.shard) AS shard,
         |  coalesce(n_before, 0) AS n_before,
         |  coalesce(n_after, 0) AS n_after,
         |  coalesce(n_arrived, 0) AS n_arrived
         |FROM aft FULL OUTER JOIN bef ON aft.shard = bef.shard
         |ORDER BY shard""".stripMargin
    },
    "t22_checkpoint_restart" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  round(CAST(sum(CAST(floor(value * 1e4 + 0.5) AS BIGINT)) AS DOUBLE)
        |    / 10000.0, 4) AS sum_value4
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin)
}
