package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-10 surface batch 31: Bradley–Terry preference strength — the
  * pairwise-comparison model behind reward modeling and ranking-from-
  * preferences: every (user, type-pair) vote becomes a comparison,
  * and the MM fixed point turns win counts into strengths.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.13; preference data is the RLHF-pipeline input shape.
  */
object SurfaceR10ae extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M104: BRADLEY–TERRY — per user, event type i "beats" type j when
    * the user produced strictly more i-events (ties are no contest);
    * the aggregated pairwise table feeds Hunter's MM iteration
    * pᵢ ← Wᵢ / Σ_j nᵢⱼ/(pᵢ+pⱼ), 15 rounds from p=1, normalized to
    * Σp = K. The DISTRIBUTED work is the comparison aggregation (one
    * shuffle keyed by user, then a bounded pair agg); the fixed-point
    * runs on the collected pair table — bounded by #types² (25 cells
    * here, 25 at any corpus size), the same bounded-collect class as
    * the nation-table landing writes, NOT a data-scaling collect. The
    * oracle replays the identical iteration in a recursive CTE, so the
    * solver itself is hash-checked, not just the comparison counts. */
  val m104BradleyTerry: Q = (s, d) => {
    val perUser = events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val a = perUser.select(col("user_id"), col("event_type").as("ia"),
      col("c").as("ca"))
    val b = perUser.select(col("user_id"), col("event_type").as("ib"),
      col("c").as("cb"))
    val pairs = a.join(b, Seq("user_id"))
      .where(col("ia") < col("ib") && col("ca") =!= col("cb"))
      .groupBy("ia", "ib")
      .agg(count(lit(1)).as("n_ij"),
        count(when(col("ca") > col("cb"), 1)).as("w_i"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val items = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val wins = items.map { it =>
      it -> (pairs.filter(_._1 == it).map(_._4).sum +
        pairs.filter(_._2 == it).map(p => p._3 - p._4).sum)
    }.toMap
    val nMat = pairs.flatMap(p =>
      Seq((p._1, p._2) -> p._3, (p._2, p._1) -> p._3)).toMap
    var p = items.map(_ -> 1.0).toMap
    // Hunter's MM, 15 rounds; j-sum in ascending item order so the
    // float op order is fixed and the oracle can replay it exactly
    for (_ <- 1 to 15) {
      val updated = items.map { i =>
        val denom = items.filter(_ != i).map { j =>
          nMat.getOrElse((i, j), 0L).toDouble / (p(i) + p(j))
        }.sum
        i -> wins(i).toDouble / denom
      }.toMap
      val tot = items.map(updated).sum
      p = items.map(i => i -> updated(i) * items.length / tot).toMap
    }
    import s.implicits._
    items.toSeq.map(i => (i, wins(i), p(i)))
      .toDF("event_type", "wins", "rating_raw")
      .select(col("event_type"), col("wins"),
        r4(col("rating_raw")).as("rating"))
      .orderBy("event_type")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m104_bradley_terry" -> m104BradleyTerry)

  val oracleSql: Map[String, String] = Map(
    "m104_bradley_terry" ->
      """WITH RECURSIVE per_user AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.event_type AS ia, b.event_type AS ib,
        |    CAST(count(*) AS BIGINT) AS n_ij,
        |    CAST(count(CASE WHEN a.c > b.c THEN 1 END) AS BIGINT) AS w_i
        |  FROM per_user a JOIN per_user b
        |    ON b.user_id = a.user_id AND a.event_type < b.event_type
        |  WHERE a.c <> b.c
        |  GROUP BY 1, 2),
        |items AS (
        |  SELECT DISTINCT it FROM (
        |    SELECT ia AS it FROM pairs UNION SELECT ib FROM pairs)),
        |nk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM items),
        |wins AS (
        |  SELECT it, CAST(sum(w) AS BIGINT) AS w FROM (
        |    SELECT ia AS it, w_i AS w FROM pairs
        |    UNION ALL SELECT ib, n_ij - w_i FROM pairs)
        |  GROUP BY it),
        |nmat AS (
        |  SELECT ia AS i, ib AS j, n_ij FROM pairs
        |  UNION ALL SELECT ib, ia, n_ij FROM pairs),
        |mm(round, ratings) AS (
        |  SELECT 0, map_from_entries(list(ROW(it, CAST(1.0 AS DOUBLE))
        |    ORDER BY it)) FROM items
        |  UNION ALL
        |  SELECT round + 1, (
        |    WITH upd AS (
        |      SELECT w1.it AS it,
        |        CAST(w1.w AS DOUBLE) / (
        |          SELECT sum(n.n_ij / (ratings[w1.it][1] + ratings[n.j][1]))
        |          FROM nmat n WHERE n.i = w1.it) AS pv
        |      FROM wins w1)
        |    SELECT map_from_entries(list(ROW(it,
        |      pv * (SELECT k FROM nk) / (SELECT sum(pv) FROM upd))
        |      ORDER BY it))
        |    FROM upd)
        |  FROM mm WHERE round < 15)
        |SELECT w.it AS event_type, w.w AS wins,
        |  round((SELECT ratings[w.it][1] FROM mm WHERE round = 15), 4) AS rating
        |FROM wins w ORDER BY event_type""".stripMargin)
}
