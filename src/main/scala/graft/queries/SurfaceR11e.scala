package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-11 surface batch 5: the second Louvain level — coarsen the
  * graph by lg12's communities and run the weighted local move on the
  * community graph.
  *
  * Contrast with near-siblings: lg12 is ONE level of local moves on
  * vertices (it can merge a vertex into a neighbouring community but
  * never two whole communities into each other); lg13 is the phase-2
  * step that makes Louvain multi-level — each level-1 community
  * becomes one weighted super-node (inter-community edge counts as
  * weights, intra-community edges as self-loops feeding the degree),
  * and the same exact-integer gain argmax runs again. This is where
  * hierarchical structure emerges: merges that need the COLLECTIVE
  * pull of a whole community happen only at this level.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.9 (graph ops).
  */
object SurfaceR11e extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Weighted local-move sweeps on the coarse graph. */
  private val LV2_ROUNDS = 2

  /** LG13: LOUVAIN LEVEL 2 — coarsen by the level-1 labels (super-node
    * = community; edge weight = inter-community edge count; self-loops
    * contribute 2w to the super-node degree, exactly the phase-2
    * bookkeeping of the published algorithm), then LV2_ROUNDS weighted
    * sweeps of the SAME integer gain argmax lg12 uses — with unweighted
    * base edges all coarse weights are counts, so the comparison stays
    * exact-integer and the DuckDB replay hash-matches. The level is
    * then ACCEPTED only if its exact-integer modularity numerator
    * Σ_c (4m·ec − dc²) beats level 1's (synchronous sweeps can
    * collectively overshoot — the published algorithm's per-level
    * improvement test, done in integers so the replay stays
    * bit-exact); on rejection the output is the level-1 labelling.
    * Scale shape per round: identical
    * to lg12 (equi-join + hash agg + per-vertex argmax window) but on
    * the COARSE graph, which is orders of magnitude smaller; the
    * coarsening itself is two label joins + one hash agg. */
  val lg13LouvainL2: Q = (s, d) => {
    val und = SurfaceR6h.knnEdges(s, d).localCheckpoint(true)
    val lab1 = SurfaceR11a.louvainLabels(s, d).localCheckpoint(true)
    val ce = und
      .join(lab1.select(col("v").as("s"), col("c").as("ca")), "s")
      .join(lab1.select(col("v").as("t"), col("c").as("cb")), "t")
      .select(least(col("ca"), col("cb")).as("a"),
        greatest(col("ca"), col("cb")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .localCheckpoint(true)
    val cadj = ce.where(col("a") =!= col("b"))
      .select(col("a").as("s"), col("b").as("t"), col("w"))
      .union(ce.where(col("a") =!= col("b"))
        .select(col("b").as("s"), col("a").as("t"), col("w")))
      .localCheckpoint(true)
    val cdeg = cadj.select(col("s").as("v"), col("w"))
      .union(ce.where(col("a") === col("b"))
        .select(col("a").as("v"), (col("w") * 2).as("w")))
      .groupBy("v").agg(sum("w").as("deg"))
      .localCheckpoint(true)
    val mrow = und.agg(count(lit(1)).as("m"))
    var lab = cdeg.select(col("v"), col("v").as("c"))
    val w = Window.partitionBy("v").orderBy(col("score").desc, col("c").asc)
    for (_ <- 1 to LV2_ROUNDS) {
      val kic = cadj
        .join(lab.select(col("v").as("t"), col("c")), "t")
        .groupBy(col("s").as("v"), col("c")).agg(sum("w").as("k"))
      val dc = lab.join(cdeg, "v")
        .groupBy("c").agg(sum("deg").as("dc"))
      val cand = kic
        .unionByName(lab.select(col("v"), col("c"), lit(0L).as("k")))
        .groupBy("v", "c").agg(max("k").as("k"))
      lab = cand
        .join(dc, "c")
        .join(cdeg, "v")
        .join(lab.select(col("v"), col("c").as("cur")), "v")
        .crossJoin(broadcast(mrow))
        .select(col("v"), col("c"),
          expr("2 * m * k - deg * (dc - CASE WHEN c = cur THEN deg" +
            " ELSE CAST(0 AS BIGINT) END)").as("score"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("v"), col("c"))
        .localCheckpoint(true)
    }
    val lab2 = lab1
      .join(lab.select(col("v").as("c"), col("c").as("c2")), "c")
      .select(col("v"), col("c2").as("c"))
      .localCheckpoint(true)
    // ACCEPTANCE CHECK (the published algorithm keeps a level only if
    // it improves Q; synchronous sweeps can collectively overshoot):
    // compare the EXACT-INTEGER modularity numerators
    // Σ_c (4m·ec − dc²) of both labellings and keep the winner —
    // monotone by construction, bit-deterministic, replayable.
    def qnum(assign: DataFrame): DataFrame = {
      val deg = adjDeg(und)
      val dc = assign.join(deg, "v").groupBy("c").agg(sum("deg").as("dc"))
      val ec = und
        .join(assign.select(col("v").as("s"), col("c").as("ca")), "s")
        .join(assign.select(col("v").as("t"), col("c").as("cb")), "t")
        .where(col("ca") === col("cb"))
        .groupBy(col("ca").as("c")).agg(count(lit(1)).as("ec"))
      dc.join(ec, Seq("c"), "left").crossJoin(broadcast(mrow))
        .agg(sum(lit(4L) * col("m") * coalesce(col("ec"), lit(0L))
          - col("dc") * col("dc")).as("qn"))
    }
    val pick = qnum(lab2).select(col("qn").as("qn2"))
      .crossJoin(broadcast(qnum(lab1).select(col("qn").as("qn1"))))
    lab1.join(lab2.select(col("v"), col("c").as("c2alt")), "v")
      .crossJoin(broadcast(pick))
      .select(col("v").as("vec_id"),
        when(col("qn2") > col("qn1"), col("c2alt")).otherwise(col("c"))
          .as("community"))
      .orderBy("vec_id")
  }

  /** Symmetric degree table of the LEVEL-1 graph (shared by both
    * modularity numerators). Takes the CHECKPOINTED edge table — a
    * fresh knnEdges call here would re-plan the brute kNN join over
    * the embeddings fact table (caught by the registry plan audit). */
  private def adjDeg(und: DataFrame): DataFrame =
    und.union(und.select(col("t").as("s"), col("s").as("t")))
      .groupBy(col("s").as("v")).agg(count(lit(1)).as("deg"))

  /** Unrolled weighted rounds for the oracle (w-prefixed CTE names so
    * they cannot collide with the level-1 chain's). */
  private def lv2RoundsSql(k: Int): String =
    (0 until k).map { i =>
      s"""wkic$i AS MATERIALIZED (
         |  SELECT cadj.s AS v, l.c, CAST(sum(cadj.w) AS BIGINT) AS k
         |  FROM cadj JOIN d$i l ON l.v = cadj.t GROUP BY 1, 2),
         |wdc$i AS MATERIALIZED (
         |  SELECT l.c, CAST(sum(g.deg) AS BIGINT) AS dc
         |  FROM d$i l JOIN cdg g ON g.v = l.v GROUP BY 1),
         |wcand$i AS MATERIALIZED (
         |  SELECT v, c, max(k) AS k FROM (
         |    SELECT v, c, k FROM wkic$i
         |    UNION ALL SELECT v, c, CAST(0 AS BIGINT) FROM d$i)
         |  GROUP BY 1, 2),
         |wsc$i AS MATERIALIZED (
         |  SELECT cand.v, cand.c,
         |    2 * mm.m * cand.k - g.deg *
         |      (dc.dc - CASE WHEN cand.c = cur.c THEN g.deg
         |                    ELSE CAST(0 AS BIGINT) END) AS score
         |  FROM wcand$i cand
         |  JOIN cdg g ON g.v = cand.v
         |  JOIN wdc$i dc ON dc.c = cand.c
         |  JOIN d$i cur ON cur.v = cand.v
         |  CROSS JOIN mm),
         |d${i + 1} AS MATERIALIZED (
         |  SELECT v, c FROM (
         |    SELECT v, c, row_number() OVER (
         |      PARTITION BY v ORDER BY score DESC, c) AS rn
         |    FROM wsc$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  private def louvainL2Sql: String =
    s"""WITH ${SurfaceR11a.louvainCtePrefix},
       |ce AS MATERIALIZED (
       |  SELECT least(la.c, lb.c) AS a, greatest(la.c, lb.c) AS b,
       |    CAST(count(*) AS BIGINT) AS w
       |  FROM e JOIN c${SurfaceR11a.LV_ROUNDS} la ON la.v = e.s
       |         JOIN c${SurfaceR11a.LV_ROUNDS} lb ON lb.v = e.t
       |  GROUP BY 1, 2),
       |cadj AS MATERIALIZED (
       |  SELECT a AS s, b AS t, w FROM ce WHERE a <> b
       |  UNION ALL SELECT b, a, w FROM ce WHERE a <> b),
       |cdg AS MATERIALIZED (
       |  SELECT v, CAST(sum(w) AS BIGINT) AS deg FROM (
       |    SELECT s AS v, w FROM cadj
       |    UNION ALL SELECT a, 2 * w FROM ce WHERE a = b)
       |  GROUP BY 1),
       |d0 AS MATERIALIZED (SELECT v, v AS c FROM cdg),
       |${lv2RoundsSql(LV2_ROUNDS)},
       |lvl2 AS MATERIALIZED (
       |  SELECT l1.v, d.c
       |  FROM c${SurfaceR11a.LV_ROUNDS} l1
       |  JOIN d$LV2_ROUNDS d ON d.v = l1.c),
       |qn1 AS MATERIALIZED (${qnumSql(s"c${SurfaceR11a.LV_ROUNDS}")}),
       |qn2 AS MATERIALIZED (${qnumSql("lvl2")})
       |SELECT l1.v AS vec_id,
       |  CASE WHEN qn2.qn > qn1.qn THEN l2.c ELSE l1.c END AS community
       |FROM c${SurfaceR11a.LV_ROUNDS} l1
       |JOIN lvl2 l2 ON l2.v = l1.v
       |CROSS JOIN qn1 CROSS JOIN qn2
       |ORDER BY vec_id""".stripMargin

  /** Exact-integer modularity numerator Σ_c (4m·ec − dc²) of a label
    * CTE over the level-1 graph — the oracle text of the acceptance
    * check. */
  private def qnumSql(labCte: String): String =
    s"""
       |  SELECT CAST(sum(4 * mm.m * coalesce(ec.ec, 0) - dc.dc * dc.dc)
       |    AS BIGINT) AS qn
       |  FROM (
       |    SELECT l.c, CAST(sum(dg.deg) AS BIGINT) AS dc
       |    FROM $labCte l JOIN dg ON dg.v = l.v GROUP BY 1) dc
       |  LEFT JOIN (
       |    SELECT la.c AS c, CAST(count(*) AS BIGINT) AS ec
       |    FROM e JOIN $labCte la ON la.v = e.s
       |           JOIN $labCte lb ON lb.v = e.t
       |    WHERE la.c = lb.c GROUP BY 1) ec ON ec.c = dc.c
       |  CROSS JOIN mm""".stripMargin

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lg13_louvain_l2" -> lg13LouvainL2)

  val oracleSql: Map[String, String] = Map(
    "lg13_louvain_l2" -> louvainL2Sql)
}
