package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 surface batch 9: the Apache DataSketches HLL surface and
  * parquet bloom-filter file metadata.
  *
  * Contrast with near-siblings: a3/a16 use Spark's internal
  * HyperLogLog++ (`approx_count_distinct` — estimate only, no
  * exchangeable state); x32 uses the `hll_sketch_agg` family added for
  * DataSketches compatibility, whose BINARY sketch is the
  * cross-system interchange format (a warehouse can hand the sketch
  * to another engine and union there) — the row exercises build,
  * binary union across groups, and estimate. s24/s6 cover parquet
  * codec/partition options; s29 exercises the writer's COLUMN BLOOM
  * FILTER option — the file-level structure that lets a point-lookup
  * scan skip row groups without any index — and proves the
  * round-tripped data is bit-identical.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2.2 (sketches), §2.1 (sources/sinks).
  */
object SurfaceR11i extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** X32: DATASKETCHES HLL — per-priority `hll_sketch_agg(custkey)`,
    * then a binary `hll_union_agg` across priorities and one estimate
    * per priority plus the union row. The a3 oracle convention: exact
    * distinct counts hash-checked, the estimate reported as a
    * tolerance FLAG (±5%) computed on the Spark side so a sketch
    * regression fails the hash compare. Scale: sketches are fixed-size
    * (lgK=12 ⇒ ~2 KB) and merge associatively — the partial-agg tree
    * carries 2 KB per group per task, the textbook sketch shape. */
  val x32DatasketchesHll: Q = (s, d) => {
    orders(s, d).createOrReplaceTempView("graft_r11_orders")
    s.sql(
      """WITH sk AS (
        |  SELECT o_orderpriority AS grp,
        |    hll_sketch_agg(o_custkey, 12) AS sketch,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs
        |  FROM graft_r11_orders GROUP BY o_orderpriority),
        |uni AS (
        |  SELECT CAST('_union' AS STRING) AS grp,
        |    hll_sketch_estimate(hll_union_agg(sketch, true)) AS est,
        |    (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT)
        |     FROM graft_r11_orders) AS exact_custs
        |  FROM sk)
        |SELECT grp, exact_custs,
        |  abs(hll_sketch_estimate(sketch) - exact_custs)
        |    <= 0.05 * exact_custs AS approx_ok
        |FROM sk
        |UNION ALL
        |SELECT grp, exact_custs,
        |  abs(est - exact_custs) <= 0.05 * exact_custs AS approx_ok
        |FROM uni
        |ORDER BY grp""".stripMargin)
  }

  /** S29: PARQUET COLUMN BLOOM FILTERS — write lineitem keys with a
    * bloom filter on l_orderkey (`parquet.bloom.filter.enabled#...`),
    * read back through a point-lookup filter, and prove the round-trip
    * exact. The bloom filter lives in the file footer and lets the
    * reader skip whole row groups on point predicates over unsorted
    * high-cardinality columns — the file-metadata complement to
    * lp31's Z-ordered min/max pruning (which needs sorted layout).
    * Correctness here;
    * the skipping is a file-format property, not a result property. */
  /** s29's exact write configuration, exposed so SurfaceR11iSpec's
    * footer assertion replays THE KEY's options rather than a
    * hand-copied duplicate that could silently drift (ADVICE r13).
    * parquet-mr skips the bloom when a column stays fully
    * dictionary-encoded (the dictionary already answers membership
    * exactly); disabling the dictionary for the key column makes the
    * bloom real at every SF instead of only past the dict page limit. */
  val s29BloomWriteOptions: Map[String, String] = Map(
    "parquet.bloom.filter.enabled#l_orderkey" -> "true",
    "parquet.bloom.filter.expected.ndv#l_orderkey" -> "100000",
    "parquet.enable.dictionary#l_orderkey" -> "false")

  val s29ParquetBloom: Q = (s, d) => {
    // per-invocation temp dir (the s17 idiom): a fixed CWD-relative path
    // races concurrent sessions / parallel runners — one overwrites while
    // the other reads, a spurious failure with no code cause (ADVICE r11)
    val dir = java.nio.file.Files.createTempDirectory("graft_s29_bloom_").toString
    graft.QueryGuard.deleteRecOnExit(new java.io.File(dir))
    lineitem(s, d).select("l_orderkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite")
      .options(s29BloomWriteOptions)
      .parquet(dir)
    s.read.parquet(dir)
      .where(col("l_orderkey") % 1000 === 1)
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").cast("long").as("qty"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_orderkey")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "x32_datasketches_hll" -> x32DatasketchesHll,
    "s29_parquet_bloom" -> s29ParquetBloom)

  val oracleSql: Map[String, String] = Map(
    "x32_datasketches_hll" ->
      """SELECT grp, exact_custs, true AS approx_ok FROM (
        |  SELECT o_orderpriority AS grp,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs
        |  FROM orders GROUP BY 1
        |  UNION ALL
        |  SELECT '_union', CAST(count(DISTINCT o_custkey) AS BIGINT)
        |  FROM orders)
        |ORDER BY grp""".stripMargin,
    "s29_parquet_bloom" ->
      """SELECT l_orderkey,
        |  CAST(sum(l_quantity) AS BIGINT) AS qty,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_orderkey % 1000 = 1
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey""".stripMargin)
}
