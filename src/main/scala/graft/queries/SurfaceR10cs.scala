package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 97: the two typed Dataset operators the
  * registry had not yet exercised — KeyValueGroupedDataset.cogroup
  * and reduceGroups.
  *
  * Contrast with near-siblings: p4 covers the typed filter/map/agg
  * spine and t6 the STREAMING stateful groups; x23 is the BATCH
  * cogroup — both sides' per-key iterators in one function, the
  * "reconcile two feeds key by key" primitive (here: order headers vs
  * their lines) that a join + agg can only emulate with two shuffles
  * and a wide row; x24 is reduceGroups — a semigroup fold that never
  * materializes a per-key buffer (vs collect_list) and stays
  * deterministic because the reducer is an associative total-order
  * max. Both produce relational readouts the DuckDB oracle verifies,
  * so the typed path's SEMANTICS (not just its types) are checked.
  *
  * Float discipline: pure integer cents/counts; the typed functions
  * do integer arithmetic only.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.12 (typed API); siblings p4 (SurfaceR5b), t6/t6b.
  */
object SurfaceR10cs extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** X23: TYPED COGROUP — reconcile order headers with their lines:
    * for every order key, the cogroup function sees the header
    * iterator and the line iterator together and emits one audit row
    * (status, header cents, summed line cents, line count), plus
    * ORPHAN rows for keys present on only one side. Readout: per
    * status — orders, lines, both cent totals; the oracle reproduces
    * it with a full-outer join + aggregation.
    *
    * Scale shape: cogroup is ONE co-partitioned shuffle of both
    * inputs on the key — the same exchange layout a full-outer join
    * would need, but the per-key logic runs once with both sides in
    * hand (no wide joined row, no second agg shuffle).
    */
  val x23Cogroup: Q = (s, d) => {
    import s.implicits._
    val heads = orders(s, d).select(col("o_orderkey"),
        col("o_orderstatus"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("hc"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
    val lines = lineitem(s, d).select(col("l_orderkey"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("lc"))
      .as[(Long, Long)]
      .groupByKey(_._1)
    heads.cogroup(lines) { (_, hs, ls) =>
      val h = hs.toSeq
      var lcSum = 0L; var nL = 0L
      ls.foreach { l => lcSum += l._2; nL += 1 }
      val status = h.headOption.map(_._2).getOrElse("ORPHAN_LINES")
      val hc = h.map(_._3).sum
      Iterator((status, h.size.toLong, nL, hc, lcSum))
    }
      .toDF("o_orderstatus", "n_orders", "n_lines", "header_cents",
        "line_cents")
      .groupBy("o_orderstatus")
      .agg(sum("n_orders").as("n_orders"), sum("n_lines").as("n_lines"),
        sum("header_cents").as("header_cents"),
        sum("line_cents").as("line_cents"))
      .orderBy("o_orderstatus")
  }

  /** X24: TYPED REDUCEGROUPS — per return flag, fold the lines with an
    * associative total-order max on (cents, orderkey, linenumber) to
    * find each flag's priciest line without buffering a group. The
    * total order makes the fold deterministic under any combine tree.
    */
  val x24ReduceGroups: Q = (s, d) => {
    import s.implicits._
    lineitem(s, d).select(col("l_returnflag"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"),
        col("l_orderkey"), col("l_linenumber").cast("long"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .reduceGroups { (a, b) =>
        val ord = Ordering[(Long, Long, Long)]
        if (ord.gteq((a._2, a._3, a._4), (b._2, b._3, b._4))) a else b
      }
      .map { case (flag, top) => (flag, top._2, top._3, top._4) }
      .toDF("l_returnflag", "max_cents", "l_orderkey", "l_linenumber")
      .orderBy("l_returnflag")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "x23_cogroup" -> x23Cogroup,
    "x24_reduce_groups" -> x24ReduceGroups)

  val oracleSql: Map[String, String] = Map(
    "x23_cogroup" ->
      """WITH h AS (
        |  SELECT o_orderkey AS k, o_orderstatus,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS hc
        |  FROM orders),
        |l AS (
        |  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS n_lines,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS lc
        |  FROM lineitem GROUP BY 1),
        |per_key AS (
        |  SELECT coalesce(h.o_orderstatus, 'ORPHAN_LINES') AS o_orderstatus,
        |    CASE WHEN h.k IS NULL THEN 0 ELSE 1 END AS n_orders,
        |    coalesce(l.n_lines, 0) AS n_lines,
        |    coalesce(h.hc, 0) AS hc, coalesce(l.lc, 0) AS lc
        |  FROM h FULL OUTER JOIN l ON h.k = l.k)
        |SELECT o_orderstatus, CAST(sum(n_orders) AS BIGINT) AS n_orders,
        |  CAST(sum(n_lines) AS BIGINT) AS n_lines,
        |  CAST(sum(hc) AS BIGINT) AS header_cents,
        |  CAST(sum(lc) AS BIGINT) AS line_cents
        |FROM per_key GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "x24_reduce_groups" ->
      """SELECT l_returnflag, max_cents, l_orderkey, l_linenumber FROM (
        |  SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS max_cents,
        |    l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY
        |      CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) DESC,
        |      l_orderkey DESC, l_linenumber DESC) AS rn
        |  FROM lineitem) WHERE rn = 1
        |ORDER BY l_returnflag""".stripMargin)
}
