package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Orc, Tables}

/** Round-10 surface batch 6: ASYMMETRIC CONTAINMENT JOIN — the
  * subset-duplicate detector (quotes, excerpts, doc-inside-doc) that
  * symmetric Jaccard (lj2) misses by construction: a 20-token quote
  * inside a 500-token article has Jaccard ≈ 0.04 but containment 1.0.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.10 (near-dup family).
  */
object SurfaceR10f extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** LJ3: prefix-filtered exact containment self-join, t = 0.9:
    * C(A→B) = |A∩B| / |A| ≥ t, A ≠ B (directional — both orientations
    * are distinct results).
    *
    * Same scale skeleton as lj2 with the ASYMMETRIC prefix: only the
    * contained side (A) can be prefix-filtered — if none of A's
    * (ma − ceil(t·ma) + 1) RAREST tokens appears in B, the overlap
    * cannot reach ceil(t·ma) — while B must be indexed in full. The
    * rarity order makes each A-prefix token low-df, which is what
    * bounds the candidate join's fanout. All thresholds in EXACT
    * integer arithmetic (`ceil(9·ma/10)` as `(9·ma + 9) div 10`):
    * 0.9 is not representable in binary, and the double `ceil` is
    * off-by-one exactly at multiples of 10. Verification rides the
    * sorted-array SortedIntersectCount kernel on two 1:1 joins;
    * 10·i ≥ 9·ma is the exact acceptance test. Oracle = brute-force
    * all-pairs in DuckDB, so any recall loss from the prefix filter
    * fails loudly. */
  val lj3Containment: Q = (s, d) => {
    // toks is deliberately NOT persisted although four consumers read
    // it: measured at sf0.1, persisting it made the query 15× SLOWER
    // (8.5–10 s → 148–163 s) — the InMemoryRelation hides scan stats,
    // the candidate join loses its broadcast/AQE decisions, and the
    // cheap re-explode is nothing next to that. Persist pays off for
    // docArrs below (expensive agg, joined 1:1 twice — the lj2 lesson);
    // it is NOT a free default on a narrow explode feeding joins.
    val toks = documents(s, d)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .where(length(col("tok")) > 0)
    val docArrs = toks.groupBy("doc_id")
      .agg(sort_array(collect_list(col("tok"))).as("ts"),
        count(lit(1)).as("m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val aPref = toks.join(dfreq, "tok")
      .join(docArrs.select("doc_id", "m"), "doc_id")
      .withColumn("pos", row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "tok")))
      .withColumn("omin", expr("(9 * m + 9) div 10"))
      .where(col("pos") <= col("m") - col("omin") + 1L)
      .select(col("doc_id").as("a_id"), col("tok"),
        col("m").as("ma"), col("omin"))
    val bAll = toks.select(col("doc_id").as("b_id"), col("tok"))
      .join(docArrs.select(col("doc_id").as("b_id"), col("m").as("mb")), "b_id")
    val cand = aPref.join(bAll,
        aPref("tok") === bAll("tok") && col("a_id") =!= col("b_id") &&
          col("mb") >= col("omin"))
      .select("a_id", "b_id", "ma").distinct()
    cand
      .join(docArrs.select(col("doc_id").as("a_id"), col("ts").as("ta")), "a_id")
      .join(docArrs.select(col("doc_id").as("b_id"), col("ts").as("tb")), "b_id")
      .withColumn("i",
        graft.functions.SetFunctions.sortedIntersectCount(col("ta"), col("tb")))
      .where(lit(10L) * col("i") >= lit(9L) * col("ma"))
      .select(col("a_id"), col("b_id"), col("i"), col("ma"),
        Orc.r4(col("i").cast("double") / col("ma").cast("double"))
          .as("containment"))
      .orderBy("a_id", "b_id")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lj3_containment" -> lj3Containment)

  val oracleSql: Map[String, String] = Map(
    "lj3_containment" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(list_distinct(string_split(text, ' ')), x -> len(x) > 0)
        |      AS toks
        |  FROM documents)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS i,
        |  CAST(len(a.toks) AS BIGINT) AS ma,
        |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |        / len(a.toks), 4) AS containment
        |FROM tk a JOIN tk b ON a.doc_id <> b.doc_id
        |WHERE 10 * len(list_intersect(a.toks, b.toks)) >= 9 * len(a.toks)
        |ORDER BY a_id, b_id""".stripMargin)
}
