package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Orc, Tables}

/** Round-10 surface batch 10: LABEL-PROPAGATION community detection on
  * the kNN graph (the modularity-free community tool that turns near-dup
  * pockets into dedup clusters), the LOG-RANK test (completing the
  * survival family: m71 estimates, m73 accumulates hazard, m75 compares
  * groups), Good–Turing unseen-mass estimation, and a k-anonymity audit
  * (the governance cousin of lt15's PII redaction).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.9 (graph/LLM ops), §2.13 (statistics).
  */
object SurfaceR10j extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val ROUNDS = 3

  /** LG5: SYNCHRONOUS LABEL PROPAGATION, 3 deterministic rounds on the
    * shared kNN edge set (SurfaceR6h.knnEdges): every vertex starts as
    * its own label; each round it adopts the most frequent label among
    * its neighbors, ties broken by smallest label — synchronous update +
    * total tie order makes the randomized textbook algorithm exactly
    * reproducible, so the oracle can replay it as unrolled SQL. Each
    * round is one equi-join + one (vertex, label) count + one per-vertex
    * arg-min window — all keyed by vertex id, nothing global, the same
    * plan shape at a billion edges. */
  val lg5LabelProp: Q = (s, d) => {
    val und = SurfaceR6h.knnEdges(s, d)
    val adj = und.union(und.select(col("t").as("s"), col("s").as("t")))
      .localCheckpoint(true)
    var labels = adj.select(col("s").as("v")).distinct()
      .withColumn("lbl", col("v"))
    val w = Window.partitionBy("v").orderBy(col("n").desc, col("nl").asc)
    for (_ <- 1 to ROUNDS) {
      val nbr = adj.join(labels.select(col("v").as("t"), col("lbl").as("nl")), "t")
        .groupBy(col("s").as("v"), col("nl")).agg(count(lit(1)).as("n"))
      labels = nbr.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("v"), col("nl").as("lbl"))
        .localCheckpoint(true)
    }
    labels.select(col("v").as("vec_id"), col("lbl").as("community"))
      .orderBy("vec_id")
  }

  /** M75: LOG-RANK TEST — is survival different for urgent orders?
    * Observed vs expected events for group 1 under the hypergeometric
    * null at every event time, accumulated into the chi-square
    * statistic. The per-time table is a day-granular aggregate (bounded
    * by calendar span, not order count), so the single-series windows
    * ride the sanctioned bounded key. */
  val m75Logrank: Q = (s, d) => {
    val base = orders(s, d).select(
      when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("g1"),
      datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
        .cast("long").as("dur"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("ev"))
    val perT = base.groupBy("dur").agg(
      sum(when(col("g1") === 1, col("ev")).otherwise(0L)).as("d1"),
      sum(col("ev")).as("dt"),
      sum(col("g1")).as("c1"),
      count(lit(1)).as("ct"))
    val wCum = graft.Windows.bounded(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(org.apache.spark.sql.graft.BoundedPartition.key)
    perT
      .withColumn("n1", sum(col("c1")).over(tot)
        - (sum(col("c1")).over(wCum) - col("c1")))
      .withColumn("nt", sum(col("ct")).over(tot)
        - (sum(col("ct")).over(wCum) - col("ct")))
      .where(col("dt") > 0 && col("nt") > 1)
      .agg(
        sum(col("d1")).cast("long").as("o1"),
        r4(sum(col("dt") * col("n1").cast("double") / col("nt"))).as("e1"),
        r4(sum(col("dt") * (col("n1").cast("double") / col("nt"))
          * (lit(1.0) - col("n1").cast("double") / col("nt"))
          * (col("nt") - col("dt")).cast("double") / (col("nt") - 1))).as("v1"),
        r4(
          pow(sum(col("d1")).cast("double")
            - sum(col("dt") * col("n1").cast("double") / col("nt")), 2.0) /
          sum(col("dt") * (col("n1").cast("double") / col("nt"))
            * (lit(1.0) - col("n1").cast("double") / col("nt"))
            * (col("nt") - col("dt")).cast("double") / (col("nt") - 1)))
          .as("chi2"))
  }

  /** LT20: GOOD–TURING frequency-of-frequencies — n_r for r = 1..10,
    * the Turing-smoothed r* = (r+1)·n_{r+1}/n_r, and the unseen-mass
    * estimate P₀ = n₁/N on every row. The corpus reduces to at most 10
    * rows after two hash aggs; the hapax count n₁ is the standard
    * "how much novel vocabulary is still out there" gate for crawl
    * snapshots. */
  val lt20GoodTuring: Q = (s, d) => {
    val vocab = documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("r"))
    val fof = vocab.groupBy("r").agg(count(lit(1)).as("n_r"))
    val n = vocab.agg(sum(col("r")).as("bigN"))
    val nxt = fof.select((col("r") - 1).as("r"), col("n_r").as("n_r1"))
    // the 10 smallest frequency classes, wherever the rare tail sits
    // (the tiny fixtures have no hapax; real crawls do) — TakeOrdered,
    // distributed
    fof.orderBy("r").limit(10)
      .join(nxt, Seq("r"), "left")
      .crossJoin(broadcast(n))
      .select(col("r"), col("n_r"),
        r4((col("r") + 1.0) * coalesce(col("n_r1"), lit(0L)) / col("n_r"))
          .as("r_star"),
        r4(col("n_r") * col("r").cast("double") / col("bigN")).as("mass"))
      .orderBy("r")
  }

  /** LP33: K-ANONYMITY AUDIT — equivalence-class sizes over the
    * quasi-identifier pair (market segment, nation) with the k=5
    * re-identification flag; the release gate run before any
    * user-joined table ships to training. One hash agg; the flag is
    * data-parallel trivially at any scale. */
  val lp33KAnonymity: Q = (s, d) => {
    customer(s, d)
      .groupBy("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("n"))
      .withColumn("k5_ok", col("n") >= 5)
      .orderBy("c_mktsegment", "c_nationkey")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lg5_label_prop" -> lg5LabelProp,
    "m75_logrank" -> m75Logrank,
    "lt20_goodturing" -> lt20GoodTuring,
    "lp33_kanonymity" -> lp33KAnonymity)

  /** Unrolled label-propagation rounds for the oracle: l0 = identity,
    * l{i+1}(v) = arg-max-count (min on ties) over neighbours' l{i}. */
  /** Unrolled label-prop rounds; `mat` pins each CTE AS MATERIALIZED
    * for consumers that re-reference the final labels several times
    * (lg10's modularity) — DuckDB inlines plain CTEs and each l_{i+1}
    * references l_i twice, so un-materialized re-expansion grows
    * exponentially in rounds (the lg8 OOM lesson). lg5 itself keeps
    * the plain form its oracle has always used. */
  private[queries] def lpRoundsSql(k: Int, mat: Boolean = false): String = {
    val m = if (mat) "MATERIALIZED " else ""
    (0 until k).map { i =>
      s"""cand$i AS $m(
         |  SELECT adj.s AS v, l$i.lbl, count(*) AS n
         |  FROM adj JOIN l$i ON l$i.v = adj.t
         |  GROUP BY 1, 2),
         |pick$i AS $m(
         |  SELECT v, lbl, row_number() OVER (
         |    PARTITION BY v ORDER BY n DESC, lbl) AS rn
         |  FROM cand$i),
         |l${i + 1} AS $m(
         |  SELECT l$i.v, coalesce(p.lbl, l$i.lbl) AS lbl
         |  FROM l$i LEFT JOIN (SELECT v, lbl FROM pick$i WHERE rn = 1) p
         |    ON p.v = l$i.v)""".stripMargin
    }.mkString(",\n")
  }

  /** The lg5 rounds constant, shared with lg10's oracle so the two
    * queries peel the same community assignment. */
  private[queries] def lpRounds: Int = ROUNDS

  val oracleSql: Map[String, String] = Map(
    "lg5_label_prop" ->
      s"""WITH ${SurfaceR6h.knnEdgesCte},
         |adj AS (SELECT s, t FROM e UNION ALL SELECT t, s FROM e),
         |l0 AS (SELECT DISTINCT s AS v, s AS lbl FROM adj),
         |${lpRoundsSql(ROUNDS)}
         |SELECT v AS vec_id, lbl AS community FROM l$ROUNDS
         |ORDER BY vec_id""".stripMargin,
    "m75_logrank" ->
      """WITH base AS (
        |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1,
        |    CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS dur,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev
        |  FROM orders),
        |pert AS (
        |  SELECT dur,
        |    CAST(sum(CASE WHEN g1 = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
        |    CAST(sum(ev) AS BIGINT) AS dt,
        |    CAST(sum(g1) AS BIGINT) AS c1,
        |    CAST(count(*) AS BIGINT) AS ct
        |  FROM base GROUP BY 1),
        |risk AS (
        |  SELECT dur, d1, dt,
        |    sum(c1) OVER () - (sum(c1) OVER w - c1) AS n1,
        |    sum(ct) OVER () - (sum(ct) OVER w - ct) AS nt
        |  FROM pert
        |  WINDOW w AS (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT CAST(sum(d1) AS BIGINT) AS o1,
        |  round(sum(dt * CAST(n1 AS DOUBLE) / nt), 4) AS e1,
        |  round(sum(dt * (CAST(n1 AS DOUBLE) / nt)
        |    * (1.0 - CAST(n1 AS DOUBLE) / nt)
        |    * CAST(nt - dt AS DOUBLE) / (nt - 1)), 4) AS v1,
        |  round(pow(CAST(sum(d1) AS DOUBLE)
        |      - sum(dt * CAST(n1 AS DOUBLE) / nt), 2.0) /
        |    sum(dt * (CAST(n1 AS DOUBLE) / nt)
        |      * (1.0 - CAST(n1 AS DOUBLE) / nt)
        |      * CAST(nt - dt AS DOUBLE) / (nt - 1)), 4) AS chi2
        |FROM risk WHERE dt > 0 AND nt > 1""".stripMargin,
    "lt20_goodturing" ->
      """WITH vocab AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS r FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok),
        |fof AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM vocab
        |        GROUP BY r ORDER BY r LIMIT 10),
        |n AS (SELECT CAST(sum(r) AS BIGINT) AS bigN FROM vocab),
        |foffull AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM vocab GROUP BY r),
        |nxt AS (SELECT r - 1 AS r, n_r AS n_r1 FROM foffull)
        |SELECT fof.r, fof.n_r,
        |  round((fof.r + 1.0) * coalesce(n_r1, 0) / fof.n_r, 4) AS r_star,
        |  round(fof.n_r * CAST(fof.r AS DOUBLE) / bigN, 4) AS mass
        |FROM fof LEFT JOIN nxt ON nxt.r = fof.r CROSS JOIN n
        |ORDER BY fof.r""".stripMargin,
    "lp33_kanonymity" ->
      """SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n,
        |  count(*) >= 5 AS k5_ok
        |FROM customer GROUP BY 1, 2
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin)
}
