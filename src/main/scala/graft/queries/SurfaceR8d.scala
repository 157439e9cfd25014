package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Upsert

/** Round-8 batch 4: CDC changelog compaction and the nearest-centroid
  * classifier over embeddings.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.10 (pipeline utilities) and §2.11 (M model family).
  */
object SurfaceR8d extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** LP26: apply a CDC changelog (I/U/D + sequence number) and
    * materialize the final table — the Debezium-feed compaction step
    * lp3's whole-batch upsert doesn't cover (deletes, and multiple
    * changes per key replayed in order). The changelog is built
    * deterministically from orders: every row INSERTs at seq 1, keys
    * ≡0 (mod 5) get a repriced UPDATE at seq 2, keys ≡0 (mod 7) a
    * DELETE at seq 3. [[Upsert.applyCdc]] keeps the last-by-seq
    * non-delete payload with one window pass keyed by the primary key
    * — cost ∝ changelog, never table history. Output aggregates by
    * priority so updated/deleted populations are separately visible. */
  val lp26CdcApply: Q = (s, d) => {
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
    Upsert.applyCdc(ins.unionAll(upd).unionAll(del),
        Seq("o_orderkey"), "seq", "op")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_rows"),
        graft.Orc.r4(sum("o_totalprice")).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** M30: nearest-centroid classification of the embeddings table —
    * per-label mean vector, every vector assigned to the max-cosine
    * centroid, output = the label × assigned confusion matrix. All
    * arithmetic runs in 1e-4-QUANTIZED INTEGER space (components →
    * BIGINT q; centroid = the re-quantized mean of q; dot and both
    * norms are exact integer sums), so Spark and DuckDB agree
    * bit-for-bit where float centroids would drift by summation order
    * — and the same integer sums partial-aggregate safely across
    * executors. The plan: one posexplode (rows × 64 dims), one
    * hash-agg for the 640-row centroid table (broadcast back), one
    * hash-agg per (vector, label) score, a 10-way per-vector argmax
    * window. Nothing holds more than #labels × dims state; the shape
    * survives any corpus size. Cosine ties break by label ascending
    * (identical bits both engines ⇒ identical ranking). */
  val m30CentroidAssign: Q = (s, d) => {
    val dims = embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("i", "v")))
      .withColumn("q",
        expr("CAST(floor(CAST(v AS DOUBLE) * 1e4 + 5e-1) AS BIGINT)"))
      .select("vec_id", "label", "i", "q")
    val cent = dims.groupBy(col("label").as("c_label"), col("i"))
      .agg(expr("CAST(floor(CAST(sum(q) AS DOUBLE) / count(*) + 5e-1) AS BIGINT)").as("cq"))
    val vnorm = dims.groupBy("vec_id").agg(sum(col("q") * col("q")).as("nv"))
    val cnorm = cent.groupBy("c_label").agg(sum(col("cq") * col("cq")).as("nc"))
    val dots = dims.join(broadcast(cent), "i")
      .groupBy("vec_id", "c_label")
      .agg(sum(col("q") * col("cq")).as("dot"))
    val cos = col("dot").cast("double") /
      (sqrt(col("nv").cast("double")) * sqrt(col("nc").cast("double")))
    val assigned = dots
      .join(vnorm, "vec_id").join(broadcast(cnorm), "c_label")
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(cos.desc, col("c_label").asc)))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("c_label").as("assigned"))
    embeddings(s, d).select(col("vec_id"), col("label"))
      .join(assigned, "vec_id")
      .groupBy(col("label").cast("long").as("true_label"),
        col("assigned").cast("long").as("assigned"))
      .agg(count(lit(1)).as("n"))
      .orderBy("true_label", "assigned")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp26_cdc_apply" -> lp26CdcApply,
    "m30_centroid_assign" -> m30CentroidAssign)

  val oracleSql: Map[String, String] = Map(
    "lp26_cdc_apply" ->
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
        |  FROM base WHERE o_orderkey % 7 = 0),
        |last AS (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY seq DESC, op DESC) AS rn
        |  FROM log)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows,
        |  round(sum(o_totalprice), 4) AS sum_price
        |FROM last WHERE rn = 1 AND op <> 'D'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "m30_centroid_assign" ->
      """WITH dims AS (
        |  SELECT vec_id, label, i,
        |    CAST(floor(CAST(list_extract(embedding, CAST(i + 1 AS INT)) AS DOUBLE)
        |               * 1e4 + 5e-1) AS BIGINT) AS q
        |  FROM embeddings CROSS JOIN range(64) AS t(i)),
        |cent AS (
        |  SELECT label AS c_label, i,
        |    CAST(floor(CAST(CAST(sum(q) AS BIGINT) AS DOUBLE) / count(*) + 5e-1)
        |         AS BIGINT) AS cq
        |  FROM dims GROUP BY label, i),
        |vnorm AS (
        |  SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS nv FROM dims GROUP BY vec_id),
        |cnorm AS (
        |  SELECT c_label, CAST(sum(cq * cq) AS BIGINT) AS nc FROM cent GROUP BY c_label),
        |dots AS (
        |  SELECT d.vec_id, c.c_label, CAST(sum(d.q * c.cq) AS BIGINT) AS dot
        |  FROM dims d JOIN cent c ON d.i = c.i GROUP BY d.vec_id, c.c_label),
        |scored AS (
        |  SELECT dots.vec_id, c_label,
        |    row_number() OVER (PARTITION BY dots.vec_id
        |      ORDER BY CAST(dot AS DOUBLE) /
        |        (sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE))) DESC,
        |        c_label ASC) AS rn
        |  FROM dots JOIN vnorm USING (vec_id) JOIN cnorm USING (c_label))
        |SELECT CAST(e.label AS BIGINT) AS true_label,
        |  CAST(s.c_label AS BIGINT) AS assigned,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM embeddings e JOIN scored s ON e.vec_id = s.vec_id AND s.rn = 1
        |GROUP BY e.label, s.c_label ORDER BY true_label, assigned""".stripMargin)
}
