package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-5 final surface additions: dynamic partition pruning, the
  * df.stat contingency-table API, join-strategy hints, and a PII-style
  * redaction pass over the documents corpus.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.1 (sources/layout), §2.3 (joins), §2.4 (aggregates),
  * §2.10 (text pipeline).
  */
/** Typed row for the Dataset[T] demo — top-level so the case-class
  * Encoder derives. */
case class LineitemT(l_orderkey: Long, l_quantity: Double,
    l_extendedprice: Double, l_discount: Double, l_returnflag: String)

object SurfaceR5b extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Q16: dynamic partition pruning — THE mechanism that makes
    * dim-filtered fact scans cheap at 100 TB: the fact table is laid out
    * partitioned by the join column, the dim side's selective filter is
    * evaluated first (broadcast reuse), and only the surviving fact
    * partitions are read at all. Static pruning (s6) needs the literal in
    * the query; DPP derives it from the join at runtime. PlanSpec asserts
    * the scan carries a `dynamicpruning` partition filter.
    */
  val q16Dpp: Q = (s, d) => {
    val out = new java.io.File("target/tmp/q16_fact").getAbsolutePath
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    import s.implicits._
    // two constraints for the pruning rule to fire: the dim must be a
    // FILE source (an in-memory relation folds its filter away via
    // ConvertToLocalRelation), and the surviving predicate must be one
    // isLikelySelective() recognises (a comparison/IN/LIKE — a bare
    // boolean attribute does not count)
    val dimPath = new java.io.File("target/tmp/q16_dim").getAbsolutePath
    Seq(
      ("1-URGENT", "urgent"), ("2-HIGH", "urgent"), ("3-MEDIUM", "normal"),
      ("4-NOT SPECIFIED", "normal"), ("5-LOW", "normal"))
      .toDF("prio", "tier")
      .write.mode("overwrite").parquet(dimPath)
    val dim = s.read.parquet(dimPath)
    s.read.parquet(out)
      .join(dim.where(col("tier") === "urgent"), col("o_orderpriority") === col("prio"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), r4(sum(col("o_totalprice"))).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** A18: contingency table via df.stat.crosstab — one hash aggregate,
    * then a tiny pivot of the (few) distinct column values; scales as a
    * single groupBy as long as the SECOND column's cardinality is small
    * (which is the API's contract).
    */
  val a18Crosstab: Q = (s, d) =>
    lineitem(s, d).stat.crosstab("l_returnflag", "l_linestatus")
      .orderBy("l_returnflag_l_linestatus")

  /** J10: shuffle-hash join by hint — for mid-sized sides where
    * sort-merge pays two sorts it doesn't need and broadcast doesn't
    * fit: hash-build the smaller side per partition. The join-strategy
    * hint surface (BROADCAST / MERGE / SHUFFLE_HASH) is how a pipeline
    * author overrides the planner at scale. PlanSpec asserts
    * ShuffledHashJoin is actually selected.
    */
  val j10ShuffleHashHint: Q = (s, d) =>
    lineitem(s, d)
      .join(orders(s, d).hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"), r4(sum(col("l_extendedprice"))).as("sum_price"))
      .orderBy("o_orderpriority")

  /** LR: PII-style redaction — mask email addresses and long digit runs
    * across the corpus. One narrow projection, no shuffle; the regexes
    * stay in the portable subset both engines' dialects share (no
    * lookarounds, no backrefs).
    */
  val lrRedact: Q = (s, d) =>
    documents(s, d)
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(col("text"),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "[0-9]{3,}", "<NUM>"))
      .select(col("doc_id"), col("redacted"),
        (col("redacted") =!= col("text")).cast("int").as("was_redacted"))
      .orderBy("doc_id")

  /** A20: count-min sketch — the mergeable frequency sketch (HLL's
    * counterpart for per-item counts): fixed-size rows×cols counter
    * grid, merge = cellwise add, so partial sketches combine across
    * partitions/days without rescan. One-sided error: estimate ≥ exact
    * always, overshoot ≤ eps·N with probability 1−delta. Driver-verified
    * tolerance row (a3/a9 pattern): the exact per-segment count is
    * bit-checked against the oracle, and BOTH error-law sides are
    * folded into `approx_ok` (never undercounts, overshoot ≤ eps·N)
    * which the oracle pins to literal TRUE. The probe frame stays
    * distributed (sketch broadcast, estimate evaluated per row); only
    * the sketch itself (a few KB) crosses the driver, which is the
    * sketch's whole point.
    */
  val a20Countmin: Q = (s, d) => {
    val cust = customer(s, d)
    val cms = cust.stat.countMinSketch(col("c_mktsegment"),
      eps = 0.001, confidence = 0.99, seed = 42)
    val n = cms.totalCount()
    val bc = s.sparkContext.broadcast(cms)
    val estimate = udf((seg: String) => bc.value.estimateCount(seg))
    cust.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("exact_n"))
      .withColumn("est_n", estimate(col("c_mktsegment")))
      .select(col("c_mktsegment"), col("exact_n"),
        (col("est_n") >= col("exact_n") &&
          (col("est_n") - col("exact_n"))
            <= lit(math.ceil(0.001 * n).toLong)).as("approx_ok"))
      .orderBy("c_mktsegment")
  }

  /** F15: VARIANT semi-structured type — parse once into the binary
    * variant encoding, then typed path extraction (`variant_get`) without
    * re-parsing the JSON text per access; at scale the parse cost is paid
    * once per row, not once per extracted field, and the binary form
    * column-shreds. Oracle extracts the same paths with the JSON type.
    */
  val f15Variant: Q = (s, d) =>
    events(s, d)
      .select(col("event_id"), parse_json(col("props")).as("v"))
      .select(col("event_id"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        to_json(col("v")).as("vjson"))
      .orderBy("event_id")

  /** F16: collation-aware ordering — UTF8_LCASE sorts case-insensitively
    * inside the engine (no per-row lower() copy of the sort key in user
    * space; the collator runs inside the sort's comparator). Oracle
    * reproduces the ASCII-range semantics with lower().
    */
  val f16Collation: Q = (s, d) =>
    nation(s, d)
      .select(col("n_nationkey"),
        when(col("n_nationkey") % 2 === 0, upper(col("n_name")))
          .otherwise(lower(col("n_name"))).as("styled"))
      .orderBy(collate(col("styled"), "UTF8_LCASE"))

  /** S13: dynamic partition overwrite — the incremental-reprocess
    * primitive: rewrite ONLY the partitions present in the incoming
    * batch, leave every other partition untouched (static overwrite
    * mode would truncate the whole table first). The readback
    * aggregates across ALL partitions, so a regression to whole-table
    * truncation shows up as vanished rows in the oracle compare.
    */
  val s13DynamicOverwrite: Q = (s, d) => {
    val out = new java.io.File("target/tmp/s13_dyn").getAbsolutePath
    val o = orders(s, d).select("o_orderkey", "o_totalprice", "o_orderpriority")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    // reprocess one partition: double its prices, overwrite just it
    o.where(col("o_orderpriority") === "1-URGENT")
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("o_orderpriority").parquet(out)
    s.read.parquet(out)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), r4(sum(col("o_totalprice"))).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** J11: null-safe equi-join (`<=>` / IS NOT DISTINCT FROM) — null keys
    * match each other instead of vanishing. Scale note: null-safe
    * equality puts EVERY null row into one join group, so a null-heavy
    * key is the worst skew hazard there is; at 100 TB, split the null
    * bucket out (it's a cross product by definition) and union it back,
    * or keep AQE skew-join on. The demo keeps the null group small and
    * real.
    */
  val j11NullsafeJoin: Q = (s, d) => {
    val c = customer(s, d)
      .select(expr("nullif(c_nationkey % 7, 3)").as("k1"))
    val n = nation(s, d)
      .select(expr("nullif(n_nationkey % 7, 3)").as("k2"))
    c.join(n, col("k1") <=> col("k2"))
      .groupBy("k1").agg(count(lit(1)).as("n_pairs"))
      .orderBy(asc_nulls_first("k1"))
  }

  /** P4: typed Dataset[T] pipeline — case-class Encoder, compile-time
    * checked lambda filter/map, groupByKey + typed aggregation. The
    * tradeoff is stated, not hidden: lambda stages deserialize rows and
    * opt out of codegen'd predicate pushdown, so the explicit select
    * BEFORE `.as[T]` is what keeps the scan pruned to 5 columns; at
    * 100 TB prefer Column algebra on the hot path and reserve typed
    * lambdas for logic that genuinely needs Scala types.
    */
  val p4TypedDataset: Q = (s, d) => {
    import s.implicits._
    lineitem(s, d)
      .select("l_orderkey", "l_quantity", "l_extendedprice",
        "l_discount", "l_returnflag")
      .as[LineitemT]
      .filter(_.l_discount > 0.02)
      .map(r => (r.l_returnflag, r.l_extendedprice * (1.0 - r.l_discount)))
      .groupByKey(_._1)
      .agg(r4(sum(col("_2"))).as[Double], count(lit(1)).as[Long])
      .toDF("l_returnflag", "revenue", "n_items")
      .orderBy("l_returnflag")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "q16_dpp" -> q16Dpp,
    "a18_crosstab" -> a18Crosstab,
    "j10_shuffle_hash_hint" -> j10ShuffleHashHint,
    "lr_redact" -> lrRedact,
    "a20_countmin" -> a20Countmin,
    "f15_variant" -> f15Variant,
    "f16_collation" -> f16Collation,
    "s13_dynamic_overwrite" -> s13DynamicOverwrite,
    "j11_nullsafe_join" -> j11NullsafeJoin,
    "p4_typed_dataset" -> p4TypedDataset)

  val oracleSql: Map[String, String] = Map(
    "q16_dpp" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(sum(o_totalprice), 4) AS sum_price
        |FROM orders
        |JOIN (SELECT * FROM (VALUES ('1-URGENT'), ('2-HIGH')) AS t(prio)) dim
        |  ON o_orderpriority = dim.prio
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // exact per-segment counts bit-checked; the CMS error-law flag
    // (one-sided, overshoot ≤ eps·N) is pinned to literal TRUE (a3/a9
    // driver-verified pattern — DuckDB need not reproduce the seeded
    // count-min hashing)
    "a20_countmin" ->
      """SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS exact_n,
        |  true AS approx_ok
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "a18_crosstab" ->
      """SELECT l_returnflag AS l_returnflag_l_linestatus,
        |  count(*) FILTER (WHERE l_linestatus = 'F') AS "F",
        |  count(*) FILTER (WHERE l_linestatus = 'O') AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "j10_shuffle_hash_hint" ->
      """SELECT o_orderpriority, count(*) AS n_rows,
        |  round(sum(l_extendedprice), 4) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "p4_typed_dataset" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem WHERE l_discount > 0.02
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "j11_nullsafe_join" ->
      """WITH c AS (SELECT nullif(c_nationkey % 7, 3) AS k1 FROM customer),
        |n AS (SELECT nullif(n_nationkey % 7, 3) AS k2 FROM nation)
        |SELECT k1, count(*) AS n_pairs
        |FROM c JOIN n ON k1 IS NOT DISTINCT FROM k2
        |GROUP BY k1 ORDER BY k1 NULLS FIRST""".stripMargin,
    "s13_dynamic_overwrite" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |                 THEN o_totalprice * 2 ELSE o_totalprice END), 4)
        |    AS sum_price
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "f15_variant" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  json(props)::VARCHAR AS vjson
        |FROM events ORDER BY event_id""".stripMargin,
    "f16_collation" ->
      """SELECT n_nationkey,
        |  CASE WHEN n_nationkey % 2 = 0
        |       THEN upper(n_name) ELSE lower(n_name) END AS styled
        |FROM nation
        |ORDER BY lower(styled)""".stripMargin,
    "lr_redact" ->
      """SELECT doc_id, redacted,
        |  CAST(CASE WHEN redacted <> text THEN 1 ELSE 0 END AS INTEGER)
        |    AS was_redacted
        |FROM (
        |  SELECT doc_id, text,
        |    regexp_replace(
        |      regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '[0-9]{3,}', '<NUM>', 'g') AS redacted
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin)
}
