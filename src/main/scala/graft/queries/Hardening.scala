package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Remaining inventory rows (SURVEY.md §2): approximate aggregates
  * (A3/A9 — driver-verified via exact values + pinned envelope flags,
  * plus bounds specs), partition-local sort (O3), and an explicit
  * parquet sink round-trip (S4).
  */
object Hardening extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** A3: HLL approximate distinct, DRIVER-VERIFIED via the pinned-flag
    * pattern (a29's): different HLL implementations never value-match
    * across engines, but the EXACT count is bit-checkable and the
    * estimate's envelope flag is pinned to literal TRUE in the oracle —
    * so the driver verifies the estimate stays inside ±10% (2 absolute
    * at tiny groups; default rsd 5% is a standard deviation, not a
    * bound) every round instead of trusting a spec that ran once. */
  val a3ApproxDistinct: Q = (s, d) =>
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        approx_count_distinct(col("o_custkey")).as("approx"),
        countDistinct(col("o_custkey")).as("exact_custs"))
      .select(col("o_orderpriority"), col("exact_custs"),
        (abs(col("approx") - col("exact_custs")) <=
          greatest(lit(2L), (col("exact_custs") * 0.10d).cast("long"))).as("approx_ok"))
      .orderBy("o_orderpriority")

  /** A9: approximate percentile, DRIVER-VERIFIED like a3: the exact
    * p50 is bit-checked; the approx value's flag uses the ALGORITHM'S
    * guarantee (accuracy = 1000 → rank error ≤ 1/1000), so approx must
    * land inside the exact 0.495–0.505 percentile band: 5x the
    * guaranteed rank slack, because the approx answer is a RAW data
    * value while `percentile` interpolates — at tiny groups the
    * +/-0.001 band can exclude a correctly-ranked answer (seen at
    * sf0.001). Holds by construction, independent of seeds or
    * partitioning. */
  val a9ApproxPercentile: Q = (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx"),
        expr("percentile(l_extendedprice, 0.495D)").as("lo"),
        expr("percentile(l_extendedprice, 0.505D)").as("hi"),
        r4(expr("percentile(l_extendedprice, 0.5)")).as("p50_exact"))
      .select(col("l_returnflag"), col("p50_exact"),
        (col("approx") >= col("lo") && col("approx") <= col("hi")).as("approx_ok"))
      .orderBy("l_returnflag")

  /** O3: sortWithinPartitions (partition-local order is an execution
    * detail — a global re-sort on top makes the result deterministic and
    * oracle-checkable; the spec asserts the within-partition ordering). */
  val o3SortWithinPartitions: Q = (s, d) =>
    lineitem(s, d)
      .repartition(4, col("l_returnflag"))
      .sortWithinPartitions("l_extendedprice")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(50)

  /** S4: explicit parquet sink round-trip — write an aggregate, read it
    * back, return it (the oracle recomputes from the source table). */
  val s4ParquetSink: Q = (s, d) => {
    val out = new java.io.File("target/tmp/s4_sink").getAbsolutePath
    nation(s, d)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_nations"))
      .coalesce(1)
      .write.mode("overwrite").parquet(out)
    s.read.parquet(out).orderBy("n_regionkey")
  }

  /** S7: ORC sink + source round-trip (Spark ships native ORC support;
    * the oracle recomputes from the parquet fixture, so a lossy
    * round-trip — types, nulls, ordering — fails the compare). */
  val s7OrcRoundtrip: Q = (s, d) => {
    val out = new java.io.File("target/tmp/s7_orc").getAbsolutePath
    supplier(s, d)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
      .write.mode("overwrite").orc(out)
    s.read.orc(out)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_sups"), r4(sum("s_acctbal")).as("sum_bal"))
      .orderBy("s_nationkey")
  }

  /** O1: explicit global multi-key sort with mixed direction and
    * NULLS FIRST / NULLS LAST (the one O-row q7 doesn't exercise).
    * A derived nullable column makes the null ordering observable. */
  val o1SortNulls: Q = (s, d) =>
    customer(s, d)
      .withColumn("bal_pos",
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
      .select("c_custkey", "c_mktsegment", "bal_pos")
      .orderBy(
        asc("c_mktsegment"),
        desc_nulls_first("bal_pos"),
        asc("c_custkey"))

  /** S6: partitioned parquet sink + pruned readback — at 100 TB this is
    * THE layout decision (a predicate on the partition column prunes
    * whole directories before any IO). PlanSpec asserts the read shows
    * PartitionFilters; here the oracle checks result equality. */
  val s6PartitionedSink: Q = (s, d) => {
    val out = new java.io.File("target/tmp/s6_sink").getAbsolutePath
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    s.read.parquet(out)
      .where(col("o_orderpriority") === "1-URGENT")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), r4(sum("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** W7b/X4: windowless per-key top-k via the bounded-heap aggregate —
    * identical semantics to q3's row_number route, but the shuffle
    * carries at most k entries per key per map task instead of every
    * row (the 100 TB version of "top 3 orders per customer"). */
  val x5TopkAgg: Q = (s, d) =>
    orders(s, d)
      .groupBy("o_custkey")
      .agg(org.apache.spark.sql.graft.TopKByScore.topK(
        col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(
        col("o_custkey"),
        col("e.tie").as("o_orderkey"),
        col("e.score").as("o_totalprice"),
        (col("pos") + 1).as("rn"))
      .orderBy("o_custkey", "rn")

  /** Salted skew join — semantics must equal the plain equi-join, so the
    * oracle is the unsalted SQL join. */
  val x4SaltedJoin: Q = (s, d) =>
    graft.operators.SkewJoin.saltedJoin(
      lineitem(s, d), orders(s, d),
      "l_orderkey", "o_orderkey", "l_linenumber", saltFactor = 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), r4(sum("l_quantity")).as("sum_qty"))
      .orderBy("o_orderpriority")

  /** D1: DECIMAL end-to-end — money aggregates in DecimalType, not
    * double (SURVEY §1.2; r02 VERDICT missing #3). Decimals are built
    * from exact sources (integral l_quantity; prices floor-rounded to 2
    * decimals with the house IEEE sequence BEFORE the cast, so both
    * engines cast the identical double to the identical decimal), then
    * all arithmetic is exact: sum, and price*(1-disc) at decimal(17,4).
    * The COMPARE boundary emits doubles: DECIMAL output columns hash
    * differently across engine/reader physical representations (int64 vs
    * int128 vs Decimal objects — r03 VERDICT), so after the exact decimal
    * math both sides cast the pinned-precision result to DOUBLE. The cast
    * is value-exact here (sum*10^scale < 2^53) and both engines produce
    * the identical nearest double; the decimal plan shape is still
    * asserted by PlanSpec. */
  val d1DecimalAgg: Q = (s, d) =>
    lineitem(s, d)
      .select(
        col("l_returnflag"),
        Orc.rN(col("l_extendedprice"), 2).cast("decimal(12,2)").as("price_dec"),
        col("l_quantity").cast("decimal(12,2)").as("qty_dec"),
        Orc.rN(col("l_discount"), 2).cast("decimal(4,2)").as("disc_dec"))
      .groupBy("l_returnflag")
      .agg(
        sum(col("price_dec")).cast("decimal(18,2)").cast("double").as("sum_price_dec"),
        sum(col("qty_dec")).cast("decimal(18,2)").cast("double").as("sum_qty_dec"),
        sum(col("price_dec") * (lit(1).cast("decimal(3,2)") - col("disc_dec")))
          .cast("decimal(22,4)").cast("double").as("revenue_dec"),
        count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")

  /** S8: SQL-managed table lifecycle — CREATE TABLE AS + INSERT INTO
    * through the session catalog, then aggregate the managed table. The
    * oracle recomputes from the source, so the round-trip through the
    * catalog (CTAS write, INSERT append, catalog read-back) is what is
    * being checked. */
  val s8SqlTableLifecycle: Q = (s, d) => {
    nation(s, d).createOrReplaceTempView("graft_s8_nation_src")
    s.sql("DROP TABLE IF EXISTS graft_s8_nation")
    // a previous JVM's warehouse dir survives while the in-memory catalog
    // does not — DROP alone can't see it, CTAS then hits
    // LOCATION_ALREADY_EXISTS; remove the physical location too
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), "graft_s8_nation")
    loc.getFileSystem(s.sparkContext.hadoopConfiguration).delete(loc, true)
    s.sql(
      """CREATE TABLE graft_s8_nation USING PARQUET AS
        |SELECT n_nationkey, n_name, n_regionkey
        |FROM graft_s8_nation_src WHERE n_regionkey < 3""".stripMargin)
    s.sql(
      """INSERT INTO graft_s8_nation
        |SELECT n_nationkey, n_name, n_regionkey
        |FROM graft_s8_nation_src WHERE n_regionkey >= 3""".stripMargin)
    s.sql(
      """SELECT n_regionkey, count(*) AS n_nations,
        |       min(n_name) AS first_name
        |FROM graft_s8_nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
  }

  /** A13: conditional aggregation — count_if / filtered sum / filtered
    * avg, the standard OLAP "metrics by flag" shape. */
  val a13ConditionalAgg: Q = (s, d) =>
    orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        count_if(col("o_orderstatus") === "F").as("n_f"),
        r4(sum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(0.0))).as("sum_f"),
        r4(avg(when(col("o_orderstatus") === "O", col("o_totalprice"))))
          .as("avg_o"))
      .orderBy("o_orderpriority")

  /** S9: catalog VIEW lifecycle — CREATE OR REPLACE VIEW over a joined
    * shape, then query through the view name. */
  val s9SqlView: Q = (s, d) => {
    nation(s, d).createOrReplaceTempView("graft_s9_nation_src")
    region(s, d).createOrReplaceTempView("graft_s9_region_src")
    // TEMPORARY: a persistent view may not reference temp-view sources
    s.sql(
      """CREATE OR REPLACE TEMPORARY VIEW graft_s9_region_nations AS
        |SELECT r.r_name, n.n_name, n.n_nationkey
        |FROM graft_s9_nation_src n
        |JOIN graft_s9_region_src r ON n.n_regionkey = r.r_regionkey""".stripMargin)
    s.sql(
      """SELECT r_name, count(*) AS n_nations, min(n_name) AS first_name
        |FROM graft_s9_region_nations
        |GROUP BY r_name ORDER BY r_name""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "d1_decimal_agg" -> d1DecimalAgg,
    "s9_sql_view" -> s9SqlView,
    "a13_conditional_agg" -> a13ConditionalAgg,
    "s8_sql_table_lifecycle" -> s8SqlTableLifecycle,
    "a3_approx_distinct" -> a3ApproxDistinct,
    "a9_approx_percentile" -> a9ApproxPercentile,
    "o3_sort_within_partitions" -> o3SortWithinPartitions,
    "s4_parquet_sink" -> s4ParquetSink,
    "x4_salted_join" -> x4SaltedJoin,
    "o1_sort_nulls" -> o1SortNulls,
    "s6_partitioned_sink" -> s6PartitionedSink,
    "s7_orc_roundtrip" -> s7OrcRoundtrip,
    "x5_topk_agg" -> x5TopkAgg,
  )

  val oracleSql: Map[String, String] = Map(
    // exact counts bit-checked; the estimate envelope flag is pinned to
    // literal TRUE (a29 pattern — driver-verified without DuckDB
    // reproducing Spark's HLL)
    "a3_approx_distinct" ->
      """SELECT o_orderpriority,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
        |  true AS approx_ok
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // exact p50 bit-checked (percentile == quantile_cont); the approx
    // flag holds by the GK-sketch rank-error guarantee
    "a9_approx_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
        |  true AS approx_ok
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "d1_decimal_agg" ->
      """SELECT l_returnflag,
        | CAST(CAST(sum(CAST(floor(l_extendedprice * 1e2 + 0.5) / 1e2 AS DECIMAL(12,2)))
        |      AS DECIMAL(18,2)) AS DOUBLE) AS sum_price_dec,
        | CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2))
        |      AS DOUBLE) AS sum_qty_dec,
        | CAST(CAST(sum(CAST(floor(l_extendedprice * 1e2 + 0.5) / 1e2 AS DECIMAL(12,2)) *
        |          (CAST(1 AS DECIMAL(3,2)) -
        |           CAST(floor(l_discount * 1e2 + 0.5) / 1e2 AS DECIMAL(4,2))))
        |      AS DECIMAL(22,4)) AS DOUBLE) AS revenue_dec,
        | count(*) AS n_items
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "s8_sql_table_lifecycle" ->
      """SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "s9_sql_view" ->
      """SELECT r_name, count(*) AS n_nations, min(n_name) AS first_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "a13_conditional_agg" ->
      """SELECT o_orderpriority,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        | round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 4) AS sum_f,
        | round(avg(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 4) AS avg_o
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "o3_sort_within_partitions" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 50""".stripMargin,
    "s4_parquet_sink" ->
      """SELECT n_regionkey, count(*) AS n_nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "x4_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items, round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "o1_sort_nulls" ->
      """SELECT c_custkey, c_mktsegment,
        | CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_pos
        |FROM customer
        |ORDER BY c_mktsegment ASC, bal_pos DESC NULLS FIRST, c_custkey ASC""".stripMargin,
    "s6_partitioned_sink" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        | round(sum(o_totalprice), 4) AS sum_price
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "s7_orc_roundtrip" ->
      """SELECT s_nationkey, count(*) AS n_sups, round(sum(s_acctbal), 4) AS sum_bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "x5_topk_agg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
  )
}
