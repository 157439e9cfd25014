package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import org.apache.spark.sql.graft.SketchAggs

/** Round-13 surface batch 5: mergeable-summary sketches beyond HLL
  * (KLL quantiles a35, theta set algebra a36) and the end-to-end
  * entity-resolution pipeline (q61).
  *
  * Contrast with near-siblings: a9/a20 approximate quantiles/counts
  * with Spark's built-ins; a35 is the KLL sketch (Karnin–Lang–Liberty
  * FOCS'16) as an X4 TypedImperativeAggregate — fixed-size mergeable
  * buffers with a PROVEN rank-error bound, readout checked against
  * the rank definition itself. a3/a16/x32 estimate CARDINALITIES;
  * a36 does SET ALGEBRA over distincts (|A∩B|, |A∖B|) — the thing
  * HLL registers structurally cannot answer and exact distincts need
  * a full shuffle for. lf5/lj2 emit candidate PAIRS; q61 runs the
  * whole ER pipeline — deterministic dirty-duplicate injection,
  * multi-attribute blocking, edit-distance matching, connected
  * components, canonical election — and hash-checks the final
  * cluster table.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * areas SURVEY.md §2 A/X rows + §2.13.
  */
object SurfaceR13e extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- A35: KLL quantile sketch with rank-definition readout ----

  /** A35: per-priority KLL(200) sketches of the order price, merged by
    * the partial-agg tree (~constant bytes per group per task), read
    * out at ranks .25/.5/.75. The check is the rank DEFINITION, not a
    * value compare: each estimate's observed rank (share of rows ≤ it)
    * must sit within ±6% of the target — KLL's bound at k=200 is
    * ~1.65% at 99% confidence, so the flag is stable across drives
    * while the sketch's internal randomized compaction is not
    * value-deterministic (why the estimate itself is NOT in the
    * output, the a3/x32 tolerance convention). Exact group counts
    * anchor the hash. */
  val a35KllQuantiles: Q = (s, d) => {
    val base = orders(s, d).select(col("o_orderpriority").as("grp"),
      col("o_totalprice").cast("double").as("v"))
    val ranks = Seq(0.25, 0.5, 0.75)
    val sk = base.groupBy("grp")
      .agg(SketchAggs.kllQuantiles(col("v"), 200, ranks).as("qs"),
        count(lit(1)).as("n_exact"))
    val est = sk.select(col("grp"), col("n_exact"),
      posexplode(col("qs")).as(Seq("ri", "est")))
    est.join(base, Seq("grp"))
      .groupBy("grp", "ri", "n_exact", "est")
      .agg((sum(when(col("v") <= col("est"), 1L).otherwise(0L))
        / first(col("n_exact"))).as("obs_rank"))
      .select(col("grp"),
        element_at(lit(ranks.toArray), col("ri") + 1).as("q_rank"),
        col("n_exact"),
        (abs(col("obs_rank") -
          element_at(lit(ranks.toArray), col("ri") + 1)) <= 0.06).as("rank_ok"))
      .orderBy("grp", "q_rank")
  }

  // ---- A36: theta sketch set algebra over distinct customers ----

  /** A36: customers-with-F-orders vs customers-with-O-orders as theta
    * sketches (lgK=12: exact below 4096 distincts, ~2% above), then
    * |A|, |B|, |A∩B|, |A∖B| estimated from the TWO compact sketches
    * alone — a bounded 2-row readout, never a re-scan. Exact values
    * hash-anchor each row; the estimate lands as a ±6% tolerance flag
    * (theta sketches are deterministic for a given input set, but the
    * flag convention keeps the oracle engine-neutral). */
  val a36ThetaSetops: Q = (s, d) => {
    val base = orders(s, d).select(col("o_orderstatus").as("st"),
      col("o_custkey").cast("long").as("ck"))
    val sk = base.where(col("st").isin("F", "O"))
      .groupBy("st").agg(SketchAggs.thetaSketch(col("ck"), 12).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    require(sk.contains("F") && sk.contains("O"),
      s"a36: fixture is missing an order status — have ${sk.keys.mkString(",")}, need F and O")
    val (fBytes, oBytes) = (sk("F"), sk("O"))
    val estF = SketchAggs.thetaEstimate(fBytes)
    val estO = SketchAggs.thetaEstimate(oBytes)
    val estI = SketchAggs.thetaIntersectEstimate(fBytes, oBytes)
    val estD = SketchAggs.thetaDifferenceEstimate(fBytes, oBytes)
    val exact = base.groupBy("ck").agg(
      max(when(col("st") === "F", 1).otherwise(0)).as("inF"),
      max(when(col("st") === "O", 1).otherwise(0)).as("inO"))
      .agg(sum("inF").as("nF"), sum("inO").as("nO"),
        sum(col("inF") * col("inO")).as("nI"),
        sum(col("inF") * (lit(1) - col("inO"))).as("nD"))
      .collect()(0)
    val (nF, nO, nI, nD) = (exact.getLong(0), exact.getLong(1),
      exact.getLong(2), exact.getLong(3))
    def ok(est: Double, ex: Long): Boolean = math.abs(est - ex) <= 0.06 * ex
    import s.implicits._
    Seq(
      ("distinct_F", nF, ok(estF, nF)),
      ("distinct_O", nO, ok(estO, nO)),
      ("intersection", nI, ok(estI, nI)),
      ("difference_F_minus_O", nD, ok(estD, nD)))
      .toDF("setop", "exact", "approx_ok")
      .orderBy("setop")
  }

  // ---- Q61: end-to-end entity resolution ----

  /** Q61: the full ER pipeline over a deterministically dirtied
    * customer table. Injection: every mod-10 customer gains a
    * substituted-last-char twin (+1 M key) and every mod-20 one also a
    * truncated twin (+2 M key) — clusters of size 2–3 whose members
    * chain by ≤2 edits. Match rule is MULTI-ATTRIBUTE (edit distance
    * ≤2 AND equal nation AND equal balance) because near-identical
    * synthetic names make edit distance alone collide for REAL
    * neighbors (Customer#…10 vs …11 is one edit apart — the classic
    * ER false-positive, defeated by evidence beyond the name).
    * Blocking: the name's first 7 digits (mutations touch only the
    * tail) — ~100-key blocks, so candidate pairs stay linear in table
    * size at any SF. Components are resolved with the bounded-round
    * CC operator and each cluster elects min-key as canonical; output
    * is every non-trivial cluster membership, hash-checked against a
    * recursive-CTE oracle that replays the same injection + rules. */
  val q61EntityResolution: Q = (s, d) => {
    val base = customer(s, d).select(col("c_custkey").cast("long").as("k"),
      col("c_name").as("nm"), col("c_nationkey").as("nat"),
      col("c_acctbal").as("bal"))
    val dirty1 = base.where(col("k") % 10 === 0)
      .select((col("k") + 1000000L).as("k"),
        concat(expr("substring(nm, 1, length(nm) - 1)"), lit("X")).as("nm"),
        col("nat"), col("bal"))
    val dirty2 = base.where(col("k") % 20 === 0)
      .select((col("k") + 2000000L).as("k"),
        expr("substring(nm, 1, length(nm) - 1)").as("nm"),
        col("nat"), col("bal"))
    // corpus (itself a 3-branch union re-scanning customer per branch)
    // feeds the join's BOTH sides plus the vertex set — materialize
    // once instead of 9 customer scans (guide §5)
    val corpus = base.unionByName(dirty1).unionByName(dirty2)
      .withColumn("blk", expr("substring(nm, 10, 7)"))
      .localCheckpoint(true)
    val l = corpus.select(col("k").as("k1"), col("nm").as("nm1"),
      col("nat").as("nat1"), col("bal").as("bal1"), col("blk"))
    val r = corpus.select(col("k").as("k2"), col("nm").as("nm2"),
      col("nat").as("nat2"), col("bal").as("bal2"), col("blk"))
    val edges = l.join(r, Seq("blk"))
      .where(col("k1") < col("k2") &&
        col("nat1") === col("nat2") && col("bal1") === col("bal2") &&
        levenshtein(col("nm1"), col("nm2")) <= 2)
      .select(col("k1").as("src"), col("k2").as("dst"))
    val verts = corpus.select(col("k").as("id"))
    val cc = graft.operators.Components.connectedComponents(verts, edges)
    val Seq(idC, compC) = cc.columns.take(2).toSeq
    val comp = cc.select(col(idC).as("k"), col(compC).as("cid"))
    val sizes = comp.groupBy("cid").agg(count(lit(1)).as("sz"),
      min(col("k")).as("canonical"))
      .where(col("sz") >= 2)
    comp.join(sizes, Seq("cid"))
      .select(col("k"), col("canonical"), col("sz").as("cluster_size"))
      .orderBy("k")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "a35_kll_quantiles" -> a35KllQuantiles,
    "a36_theta_setops" -> a36ThetaSetops,
    "q61_entity_resolution" -> q61EntityResolution)

  val oracleSql: Map[String, String] = Map(
    "a35_kll_quantiles" ->
      """WITH g AS (
        |  SELECT o_orderpriority AS grp, CAST(count(*) AS BIGINT) AS n_exact
        |  FROM orders GROUP BY 1)
        |SELECT grp, q_rank, n_exact, TRUE AS rank_ok
        |FROM g, (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
        |                (CAST(0.75 AS DOUBLE))) AS r(q_rank)
        |ORDER BY grp, q_rank""".stripMargin,
    "a36_theta_setops" ->
      """WITH m AS (
        |  SELECT o_custkey AS ck,
        |    max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS inF,
        |    max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS inO
        |  FROM orders GROUP BY 1),
        |t AS (
        |  SELECT CAST(sum(inF) AS BIGINT) AS nF,
        |    CAST(sum(inO) AS BIGINT) AS nO,
        |    CAST(sum(inF * inO) AS BIGINT) AS nI,
        |    CAST(sum(inF * (1 - inO)) AS BIGINT) AS nD
        |  FROM m)
        |SELECT 'difference_F_minus_O' AS setop, nD AS exact, TRUE AS approx_ok FROM t
        |UNION ALL SELECT 'distinct_F', nF, TRUE FROM t
        |UNION ALL SELECT 'distinct_O', nO, TRUE FROM t
        |UNION ALL SELECT 'intersection', nI, TRUE FROM t
        |ORDER BY setop""".stripMargin,
    "q61_entity_resolution" ->
      """WITH RECURSIVE base AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS k, c_name AS nm,
        |    c_nationkey AS nat, c_acctbal AS bal
        |  FROM customer),
        |corpus AS (
        |  SELECT k, nm, nat, bal FROM base
        |  UNION ALL
        |  SELECT k + 1000000,
        |    substring(nm, 1, length(nm) - 1) || 'X', nat, bal
        |  FROM base WHERE k % 10 = 0
        |  UNION ALL
        |  SELECT k + 2000000, substring(nm, 1, length(nm) - 1), nat, bal
        |  FROM base WHERE k % 20 = 0),
        |blocked AS (SELECT *, substring(nm, 10, 7) AS blk FROM corpus),
        |edges AS (
        |  SELECT a.k AS src, b.k AS dst
        |  FROM blocked a JOIN blocked b USING (blk)
        |  WHERE a.k < b.k AND a.nat = b.nat AND a.bal = b.bal
        |    AND levenshtein(a.nm, b.nm) <= 2),
        |sym AS (SELECT src, dst FROM edges
        |        UNION ALL SELECT dst, src FROM edges),
        |reach(k, c) AS (
        |  SELECT src AS k, src AS c FROM sym
        |  UNION
        |  SELECT s.dst AS k, r.c
        |  FROM reach r JOIN sym s ON s.src = r.k),
        |cc AS (SELECT k, min(c) AS cid FROM reach GROUP BY k),
        |sizes AS (
        |  SELECT cid, CAST(count(*) AS BIGINT) AS cluster_size,
        |    min(k) AS canonical
        |  FROM cc GROUP BY cid HAVING count(*) >= 2)
        |SELECT cc.k, sizes.canonical, sizes.cluster_size
        |FROM cc JOIN sizes USING (cid)
        |ORDER BY cc.k""".stripMargin)
}
