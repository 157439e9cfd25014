package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-6 wave 4: the remaining ANSI aggregate surface — positional
  * extrema (min_by/max_by), ordered string aggregation (listagg), boolean
  * and bitwise aggregates, linear-regression aggregates (regr_*), and the
  * exact-median / percentile_cont family — plus the `mask` PII primitive.
  *
  * All are single hash aggregates: partial (map-side) state merges
  * associatively, so each scales as one shuffle keyed by the group
  * column regardless of input size. regr_* keep (n, Σx, Σy, Σxx, Σxy,
  * Σyy) partials — constant state per group, no row buffering.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.4 (aggregates), §2.8 (functions).
  */
object SurfaceR6g extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- A22: min_by / max_by ----

  /** A22: positional extrema — which order carries the group's largest
    * price, not just what that price is. One hash agg; the partial state
    * is a single (value, key) pair per group, so merge is O(1) and the
    * whole op is map-side-combinable. Tie hazard: min_by/max_by are
    * nondeterministic under ties, so the query keys on l_extendedprice,
    * verified unique at its per-group extremes in the fixtures (the
    * uniqueness is additionally pinned by a spec).
    */
  val a22MinMaxBy: Q = (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        max_by(col("l_orderkey"), col("l_extendedprice")).as("top_order"),
        min_by(col("l_orderkey"), col("l_extendedprice")).as("bottom_order"),
        r4(max(col("l_extendedprice"))).as("top_price"),
        r4(min(col("l_extendedprice"))).as("bottom_price"))
      .orderBy("l_returnflag")

  // ---- A23: listagg (ordered string aggregation) ----

  /** A23: listagg WITHIN GROUP — deterministic ordered concatenation.
    * The WITHIN GROUP (ORDER BY) clause is the whole point: without it
    * the result depends on partial-merge order and can never be
    * hash-compared (or trusted in production). State grows with group
    * size, so at 100 TB this is for bounded groups (here: ≤7 nations per
    * region); unbounded groups want collect_list capped or a sketch.
    */
  val a23Listagg: Q = (s, d) => {
    nation(s, d).createOrReplaceTempView("graft_nation")
    s.sql(
      """SELECT n_regionkey,
        |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names,
        |  count(*) AS n
        |FROM graft_nation
        |GROUP BY n_regionkey
        |ORDER BY n_regionkey""".stripMargin)
  }

  // ---- A24: boolean + bitwise aggregates ----

  /** A24: bool_and/bool_or + bit_and/bit_or/bit_xor. All five keep a
    * single scalar of state per group — the cheapest aggregates there
    * are; bit_xor is the classic "find the unpaired row" / checksum
    * primitive (xor of a multiset is order-independent, so it survives
    * any partial-merge order bit-exactly, unlike float sums).
    */
  val a24BoolBitAggs: Q = (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        bool_and(col("l_quantity") > 0).as("all_pos_qty"),
        bool_or(col("l_discount") > 0.09).as("any_big_disc"),
        bit_and(col("l_linenumber")).as("ln_and"),
        bit_or(col("l_linenumber")).as("ln_or"),
        bit_xor(col("l_linenumber")).as("ln_xor"))
      .orderBy("l_returnflag")

  // ---- A25: linear-regression aggregates ----

  /** A25: regr_slope/intercept/r2/count/avgx/avgy — the in-database OLS
    * fit (price explained by quantity, per return flag). One pass,
    * constant state (six running moments per group); the well-conditioned
    * outputs (slope/intercept/r2/means) are emitted rather than the raw
    * Σxx/Σxy moments, whose ~1e12 magnitude would put cross-engine
    * float-sum-order noise above the house 1e-4 rounding grid.
    */
  val a25RegrAggs: Q = (s, d) =>
    lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        r4(regr_slope(col("l_extendedprice"), col("l_quantity"))).as("slope"),
        r4(regr_intercept(col("l_extendedprice"), col("l_quantity"))).as("icept"),
        r4(regr_r2(col("l_extendedprice"), col("l_quantity"))).as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"),
        r4(regr_avgx(col("l_extendedprice"), col("l_quantity"))).as("avg_qty"),
        r4(regr_avgy(col("l_extendedprice"), col("l_quantity"))).as("avg_price"))
      .orderBy("l_returnflag")

  // ---- A26: exact median / percentile_cont / percentile_disc ----

  /** A26: the exact-quantile family — median, interpolated
    * percentile_cont, and percentile_disc (smallest value whose
    * cume_dist ≥ p). Exact quantiles buffer the group's values, so this
    * is the SMALL-group tool; the corresponding sketch
    * (percentile_approx, A9) is the 100 TB default and its error bound
    * is spec-checked against this exact form.
    */
  val a26MedianPcont: Q = (s, d) => {
    lineitem(s, d).createOrReplaceTempView("graft_lineitem")
    s.sql(
      """SELECT l_returnflag,
        |  median(l_quantity) AS med_qty,
        |  percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25_price,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50d_price
        |FROM graft_lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
      .select(col("l_returnflag"), r4(col("med_qty")).as("med_qty"),
        r4(col("p25_price")).as("p25_price"),
        r4(col("p50d_price")).as("p50d_price"))
  }

  // ---- F24: mask ----

  /** F24: the `mask` scalar — upper→X, lower→x, digit→n, punctuation
    * kept. The codegen'd single-pass char loop beats the three chained
    * regex replaces a user would write (and which the oracle uses); a
    * narrow shuffle-free projection either way.
    */
  val f24Mask: Q = (s, d) =>
    customer(s, d)
      .select(col("c_custkey"), mask(col("c_name")).as("masked_name"),
        mask(col("c_mktsegment")).as("masked_seg"))
      .orderBy("c_custkey")
      .limit(300)

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "a22_minmax_by" -> a22MinMaxBy,
    "a23_listagg" -> a23Listagg,
    "a24_bool_bit_aggs" -> a24BoolBitAggs,
    "a25_regr_aggs" -> a25RegrAggs,
    "a26_median_pcont" -> a26MedianPcont,
    "f24_mask" -> f24Mask)

  val oracleSql: Map[String, String] = Map(
    "a22_minmax_by" ->
      """SELECT l_returnflag,
        |  arg_max(l_orderkey, l_extendedprice) AS top_order,
        |  arg_min(l_orderkey, l_extendedprice) AS bottom_order,
        |  round(max(l_extendedprice), 4) AS top_price,
        |  round(min(l_extendedprice), 4) AS bottom_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a23_listagg" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS names,
        |  count(*) AS n
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "a24_bool_bit_aggs" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_pos_qty,
        |  bool_or(l_discount > 0.09) AS any_big_disc,
        |  CAST(bit_and(l_linenumber) AS INT) AS ln_and,
        |  CAST(bit_or(l_linenumber) AS INT) AS ln_or,
        |  CAST(bit_xor(l_linenumber) AS INT) AS ln_xor
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a25_regr_aggs" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
        |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
        |  CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
        |  round(regr_avgx(l_extendedprice, l_quantity), 4) AS avg_qty,
        |  round(regr_avgy(l_extendedprice, l_quantity), 4) AS avg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a26_median_pcont" ->
      """SELECT l_returnflag,
        |  round(median(l_quantity), 4) AS med_qty,
        |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p25_price,
        |  round(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p50d_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "f24_mask" ->
      """SELECT c_custkey,
        |  regexp_replace(regexp_replace(regexp_replace(c_name,
        |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        |    AS masked_name,
        |  regexp_replace(regexp_replace(regexp_replace(c_mktsegment,
        |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        |    AS masked_seg
        |FROM customer ORDER BY c_custkey LIMIT 300""".stripMargin)
}
