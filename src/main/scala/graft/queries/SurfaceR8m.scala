package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}
import graft.operators.Upsert

/** Round-8 batch 13: snapshot reconciliation.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.10 (pipeline utilities / data-ops reporting).
  */
object SurfaceR8m extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Q31: snapshot diff — reconcile a table against its post-CDC
    * successor (lp26's changelog replayed, plus fresh keyed inserts) and report added / removed /
    * changed / unchanged populations with their revenue deltas. One
    * full-outer join on the primary key (the same co-locatable shuffle
    * a MERGE pays), statuses derived by null-ness and payload
    * comparison, then a 4-row rollup; the audit every ingest runs
    * before promoting a snapshot. Revenue deltas are 1e-4-quantized
    * integer sums — exact on both engines. */
  val q31SnapshotDiff: Q = (s, d) => {
    val base = orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    val ins = base
      .withColumn("op", lit("I")).withColumn("seq", lit(1L))
    val upd = base.where(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      .withColumn("o_orderpriority", lit("0-REPRICED"))
      .withColumn("op", lit("U")).withColumn("seq", lit(2L))
    val del = base.where(col("o_orderkey") % 7 === 0)
      .withColumn("op", lit("D")).withColumn("seq", lit(3L))
    val fresh = base.where(col("o_orderkey") % 97 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      .withColumn("o_orderpriority", lit("0-NEW"))
      .withColumn("op", lit("I")).withColumn("seq", lit(4L))
    val next = Upsert.applyCdc(ins.unionAll(upd).unionAll(del).unionAll(fresh),
      Seq("o_orderkey"), "seq", "op")
    val q = (c: String) =>
      expr(s"CAST(floor($c * 1e4 + 5e-1) AS BIGINT)")
    val a = base.select(col("o_orderkey").as("k"),
      q("o_totalprice").as("qa"), col("o_orderpriority").as("pa"))
    val b = next.select(col("o_orderkey").as("k"),
      q("o_totalprice").as("qb"), col("o_orderpriority").as("pb"))
    a.join(b, Seq("k"), "full_outer")
      .withColumn("status",
        when(col("qa").isNull, "added")
          .when(col("qb").isNull, "removed")
          .when(col("qa") === col("qb") && col("pa") === col("pb"), "unchanged")
          .otherwise("changed"))
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        Orc.r4((sum(coalesce(col("qb"), lit(0L))) -
          sum(coalesce(col("qa"), lit(0L)))).cast("double") / lit(1e4))
          .as("revenue_delta"))
      .orderBy("status")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "q31_snapshot_diff" -> q31SnapshotDiff)

  val oracleSql: Map[String, String] = Map(
    "q31_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders),
        |log AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority,
        |    'I' AS op, 1 AS seq FROM base
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice * 1.1, '0-REPRICED', 'U', 2
        |  FROM base WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderpriority, 'D', 3
        |  FROM base WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_totalprice, '0-NEW', 'I', 4
        |  FROM base WHERE o_orderkey % 97 = 0),
        |next AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |      ORDER BY seq DESC, op DESC) AS rn
        |    FROM log) WHERE rn = 1 AND op <> 'D'),
        |a AS (
        |  SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 1e4 + 5e-1) AS BIGINT) AS qa,
        |    o_orderpriority AS pa
        |  FROM base),
        |b AS (
        |  SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 1e4 + 5e-1) AS BIGINT) AS qb,
        |    o_orderpriority AS pb
        |  FROM next),
        |j AS (
        |  SELECT CASE WHEN qa IS NULL THEN 'added'
        |              WHEN qb IS NULL THEN 'removed'
        |              WHEN qa = qb AND pa = pb THEN 'unchanged'
        |              ELSE 'changed' END AS status,
        |    coalesce(qa, 0) AS qa0, coalesce(qb, 0) AS qb0
        |  FROM a FULL OUTER JOIN b USING (k))
        |SELECT status, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(CAST(sum(qb0) AS BIGINT) - CAST(sum(qa0) AS BIGINT)
        |        AS DOUBLE) / 1e4, 4) AS revenue_delta
        |FROM j GROUP BY status ORDER BY status""".stripMargin)
}
