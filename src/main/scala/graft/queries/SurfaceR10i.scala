package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Orc, Tables}

/** Round-10 surface batch 9: geospatial ENCODING (geohash — the
  * string-prefix form of j12's grid cells, usable as a partition/sort
  * key for spatial layout), the interval-overlap self-join (the
  * genomics/calendar "concurrent intervals" shape, distinct from j13's
  * point-in-interval), and two statistics-tail entries: Nelson–Aalen
  * cumulative hazard (m71's counting-process sibling) and Welch's
  * unequal-variance t-test.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.3 (joins), §2.8 (functions), §2.13 (statistics).
  */
object SurfaceR10i extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Test-visible aliases for j12's synthetic-coordinate SQL (the spec
    * recomputes exact doubles to drive the reference geohash). */
  def synthLatSql(key: String): String = SurfaceR6i.latSql(key)
  def synthLonSql(key: String): String = SurfaceR6i.lonSql(key)

  /** Standard geohash, 6 chars = 30 bits, built as ONE SQL expression
    * shared verbatim by both engines (only integer-div differs). Uses
    * the closed form instead of per-bit subdivision: lonInt/latInt are
    * the 15-bit scaled cells, interleaved lon-first from the MSB —
    * SurfaceR10iSpec checks the output against an independent
    * subdivision implementation of the published algorithm. */
  private[queries] def geohashSql(latE: String, lonE: String, divOp: String): String = {
    // the coordinate SQL is DECIMAL arithmetic (exact, engine-identical);
    // pin the scaling to DOUBLE explicitly so both engines run the same
    // IEEE op sequence from here on
    val lonI = s"CAST(floor((CAST($lonE AS DOUBLE) + 180.0) * 32768.0 / 360.0) AS BIGINT)"
    val latI = s"CAST(floor((CAST($latE AS DOUBLE) + 90.0) * 32768.0 / 180.0) AS BIGINT)"
    val z = (0 until 15).map { i =>
      val p = 1L << i
      s"((lon_i $divOp $p) % 2) * ${1L << (2 * i + 1)}" +
        s" + ((lat_i $divOp $p) % 2) * ${1L << (2 * i)}"
    }.mkString("(", " + ", ")")
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    val chars = (0 until 6).map { k =>
      val shift = 1L << (5 * (5 - k))
      s"substr('$alpha', CAST((zv $divOp $shift) % 32 AS INT) + 1, 1)"
    }.mkString("concat(", ", ", ")")
    (s"(SELECT $chars FROM (SELECT $z AS zv FROM " +
      s"(SELECT $lonI AS lon_i, $latI AS lat_i) AS gh_cells) AS gh_z)")
  }

  /** F28: GEOHASH ENCODE of the synthetic entity coordinates (the same
    * md5-derived positions as j12, so both engines see identical
    * doubles). A geohash is the sortable/prefix-joinable form of a 2-D
    * cell id: writing 100 TB of point data sorted by geohash gives
    * min/max file skipping on BOTH lat and lon (the string analogue of
    * lp31's Z-order — same bit interleave, base-32 serialized), and
    * prefix equality is a radius-candidate join key. Scalar-subquery
    * form keeps the shared SQL single-expression; Catalyst inlines it
    * (no join appears in the plan). */
  val f28Geohash: Q = (s, d) => {
    val gh = geohashSql(SurfaceR6i.latSql("c_custkey"),
      SurfaceR6i.lonSql("c_custkey"), "div")
    customer(s, d)
      .select(col("c_custkey"),
        r4(expr(SurfaceR6i.latSql("c_custkey"))).as("lat"),
        r4(expr(SurfaceR6i.lonSql("c_custkey"))).as("lon"),
        expr(gh).as("gh6"))
      .orderBy("c_custkey")
  }

  /** J16: INTERVAL-OVERLAP SELF-JOIN — count concurrent shipment pairs
    * per supplier in 1995 (interval × interval, unlike j13's
    * point-in-interval). Candidates come from a 30-day-bin equi-join:
    * each interval lands in at most 2 bins (transit ≤ 22 days), so the
    * explode is ≤ 2× and candidate cost is bin-local — the standard
    * genomics binning that replaces the quadratic theta join; exact
    * overlap (s_a ≤ e_b ∧ s_b ≤ e_a) verifies candidates, and a
    * distinct on the id pair dedupes the two-bin case. The oracle IS
    * the quadratic theta join, so recall of the binning is
    * hash-checked. */
  val j16IntervalOverlap: Q = (s, d) => {
    val li = lineitem(s, d)
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("l_suppkey"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        expr("CAST(CAST(l_shipdate AS TIMESTAMP) AS BIGINT)").as("s0"),
        (expr("CAST(CAST(l_shipdate AS TIMESTAMP) AS BIGINT)") +
          expr("(1 + l_partkey % 21) * 86400")).as("e0"))
    val binned = li.withColumn("bin",
      explode(array_distinct(array(
        expr("s0 div 2592000"), expr("e0 div 2592000")))))
    val a = binned.select(col("l_suppkey"), col("bin"), col("id").as("ida"),
      col("s0").as("sa"), col("e0").as("ea"))
    val b = binned.select(col("l_suppkey"), col("bin"), col("id").as("idb"),
      col("s0").as("sb"), col("e0").as("eb"))
    a.join(b, Seq("l_suppkey", "bin"))
      .where(col("ida") < col("idb") &&
        col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select("l_suppkey", "ida", "idb").distinct()
      .groupBy("l_suppkey").agg(count(lit(1)).as("n_pairs"))
      .orderBy("l_suppkey")
  }

  /** M73: NELSON–AALEN cumulative hazard H(t) = Σ d_i/n_i with the
    * counting-process variance Σ d_i/n_i² — m71's estimator pair (KM
    * estimates survival multiplicatively, NA estimates hazard
    * additively; production survival dashboards report both). Same
    * scaffolding: one (group, duration) agg, per-group running sums,
    * nothing global. */
  val m73NelsonAalen: Q = (s, d) => {
    val base = orders(s, d).select(
      col("o_orderpriority").as("grp"),
      datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
        .cast("long").as("dur"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("ev"))
    val perT = base.groupBy("grp", "dur")
      .agg(sum("ev").as("dd"), count(lit(1)).as("c"))
    val wCum = Window.partitionBy("grp").orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("grp")
    perT
      .withColumn("n_risk",
        sum(col("c")).over(tot) - (sum(col("c")).over(wCum) - col("c")))
      .where(col("dd") > 0)
      .withColumn("haz",
        sum(col("dd").cast("double") / col("n_risk")).over(wCum))
      .withColumn("vv",
        sum(col("dd").cast("double") / (col("n_risk") * col("n_risk"))).over(wCum))
      .select(col("grp"), col("dur"), col("dd"), col("n_risk"),
        r4(col("haz")).as("cum_hazard"), r4(col("vv")).as("variance"))
      .orderBy("grp", "dur")
  }

  /** M74: WELCH'S T-TEST — unequal-variance two-sample test (F vs O
    * order totals) with the Welch–Satterthwaite df. One conditional
    * aggregate over a narrow projection; the only cross-engine hazard
    * is float-sum ordering inside var_samp, far below the 1e-4 grid at
    * these magnitudes (a7/a25 precedent). */
  val m74WelchTtest: Q = (s, d) => {
    orders(s, d)
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n1"),
        count(when(col("o_orderstatus") === "O", 1)).as("n2"),
        avg(when(col("o_orderstatus") === "F", col("o_totalprice"))).as("m1"),
        avg(when(col("o_orderstatus") === "O", col("o_totalprice"))).as("m2"),
        var_samp(when(col("o_orderstatus") === "F", col("o_totalprice"))).as("v1"),
        var_samp(when(col("o_orderstatus") === "O", col("o_totalprice"))).as("v2"))
      .select(col("n1"), col("n2"),
        r4(col("m1") - col("m2")).as("mean_diff"),
        r4((col("m1") - col("m2")) /
          sqrt(col("v1") / col("n1") + col("v2") / col("n2"))).as("t_stat"),
        r4(pow(col("v1") / col("n1") + col("v2") / col("n2"), 2.0) /
          (pow(col("v1") / col("n1"), 2.0) / (col("n1") - 1) +
            pow(col("v2") / col("n2"), 2.0) / (col("n2") - 1))).as("df"))
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "f28_geohash" -> f28Geohash,
    "j16_interval_overlap" -> j16IntervalOverlap,
    "m73_nelson_aalen" -> m73NelsonAalen,
    "m74_welch_ttest" -> m74WelchTtest)

  val oracleSql: Map[String, String] = Map(
    "f28_geohash" ->
      s"""SELECT c_custkey,
        |  round(${SurfaceR6i.latSql("c_custkey")}, 4) AS lat,
        |  round(${SurfaceR6i.lonSql("c_custkey")}, 4) AS lon,
        |  ${geohashSql(SurfaceR6i.latSql("c_custkey"),
             SurfaceR6i.lonSql("c_custkey"), "//")} AS gh6
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "j16_interval_overlap" ->
      """WITH li AS (
        |  SELECT l_suppkey, l_orderkey * 8 + l_linenumber AS id,
        |    CAST(floor(epoch(l_shipdate)) AS BIGINT) AS s0,
        |    CAST(floor(epoch(l_shipdate)) AS BIGINT)
        |      + (1 + l_partkey % 21) * 86400 AS e0
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-01-01')
        |SELECT a.l_suppkey, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM li a JOIN li b
        |  ON b.l_suppkey = a.l_suppkey AND a.id < b.id
        | AND a.s0 <= b.e0 AND b.s0 <= a.e0
        |GROUP BY a.l_suppkey ORDER BY a.l_suppkey""".stripMargin,
    "m73_nelson_aalen" ->
      """WITH base AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS dur,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
        |  FROM orders),
        |pert AS (
        |  SELECT grp, dur, CAST(sum(ev) AS BIGINT) AS dd,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2),
        |risk AS (
        |  SELECT grp, dur, dd, c,
        |    sum(c) OVER (PARTITION BY grp)
        |      - (sum(c) OVER (PARTITION BY grp ORDER BY dur
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c)
        |      AS n_risk
        |  FROM pert)
        |SELECT grp, dur, dd, CAST(n_risk AS BIGINT) AS n_risk,
        |  round(sum(CAST(dd AS DOUBLE) / n_risk) OVER w, 4) AS cum_hazard,
        |  round(sum(CAST(dd AS DOUBLE) / (n_risk * n_risk)) OVER w, 4) AS variance
        |FROM risk WHERE dd > 0
        |WINDOW w AS (PARTITION BY grp ORDER BY dur
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY grp, dur""".stripMargin,
    "m74_welch_ttest" ->
      """WITH a AS (
        |  SELECT
        |    count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n1,
        |    count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n2,
        |    avg(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS m1,
        |    avg(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS m2,
        |    var_samp(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) AS v1,
        |    var_samp(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) AS v2
        |  FROM orders)
        |SELECT n1, n2, round(m1 - m2, 4) AS mean_diff,
        |  round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
        |  round(pow(v1 / n1 + v2 / n2, 2.0) /
        |    (pow(v1 / n1, 2.0) / (n1 - 1) + pow(v2 / n2, 2.0) / (n2 - 1)), 4) AS df
        |FROM a""".stripMargin)
}
