package graft

import org.apache.spark.sql.SparkSession

/** The library's session entry point: one place that encodes the
  * 100 TB posture every main in this repo (Verify, Bench, Tripwire,
  * VerifySubset) previously duplicated, so a user of the library starts
  * from the configuration the engine is designed and tested against.
  *
  * What it pins and why (SURVEY.md §4.3):
  *  - the Graft extensions (vector kernels, bloom build/probe, as-of
  *    strategy, cosine rewrite) — the custom surface IS the library;
  *  - AQE left ON (Spark default) — runtime shuffle coalescing and
  *    skew-join splitting are the first line of defense at scale;
  *  - `nanosAsLong` — the events fixture (and any ns-precision
  *    producer) fails the vectorized parquet reader without it;
  *  - UTC session time — cross-engine timestamp determinism (§5.3);
  *  - shuffle partitions sized to the master's parallelism for local
  *    runs; ON A CLUSTER leave the default and let AQE coalesce.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); this is the
  * engine-configuration contract the harness mains execute against.
  */
object GraftSession {

  /** Shuffle-partition sizing rule: local masters get their own core
    * count (a 32-thread local run with 200 partitions pays 6× task
    * overhead for nothing); anything else keeps Spark's default 200 and
    * lets AQE coalesce — a driver-side guess would be wrong on every
    * differently-sized cluster. */
  def defaultShufflePartitions(master: String): Int = master match {
    case s if s.startsWith("local[") && s.endsWith("]") =>
      s.stripPrefix("local[").stripSuffix("]") match {
        case "*" => Runtime.getRuntime.availableProcessors()
        case n   => n.toInt
      }
    case "local" => 1
    case _ => 200
  }

  /** A builder pre-loaded with the engine's posture; callers may
    * override any config before `getOrCreate()`. */
  def builder(master: String = "local[*]", shufflePartitions: Option[Int] = None)
      : SparkSession.Builder = {
    val parallelism =
      shufflePartitions.getOrElse(defaultShufflePartitions(master))
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
  }

  /** The streaming posture on top of [[builder]]: RocksDB state store —
    * off-heap, incremental-checkpoint state is the only kind that
    * survives 100 TB keyspaces (measured per round as
    * `rocksdb_state_t6_sec` in the bench probes). */
  def streamingBuilder(master: String = "local[*]"): SparkSession.Builder =
    builder(master)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
}
