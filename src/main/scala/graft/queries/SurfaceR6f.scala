package graft.queries

import org.apache.spark.ml.fpm.FPGrowth
import org.apache.spark.ml.regression.IsotonicRegression
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-6 wave 3: frequent-itemset mining (FPGrowth, oracle-checked
  * against relational support counts), hidden `_metadata` file
  * introspection (lineage/debugging at scale), and isotonic regression
  * (the monotone calibration fit).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.11 (MLlib surface), §2.1 (sources).
  */
object SurfaceR6f extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- M21: FPGrowth frequent itemsets ----

  /** M21: FPGrowth over per-order baskets of (returnflag+linestatus)
    * codes — frequent-itemset mining with the distributed FP-tree
    * (parallel conditional trees per item suffix, one shuffle by item).
    * The oracle recomputes support counts relationally for the 1- and
    * 2-itemsets (the alphabet is small enough to enumerate), so the
    * MINING result itself is hash-compared, not just sanity-checked.
    * minCount mirrors Spark's `ceil(minSupport · #baskets)`.
    */
  val m21Fpgrowth: Q = (s, d) => {
    val baskets = lineitem(s, d)
      .select(col("l_orderkey"),
        concat(col("l_returnflag"), col("l_linestatus")).as("item"))
      .distinct()
      .groupBy("l_orderkey").agg(collect_set(col("item")).as("items"))
    val model = new FPGrowth().setItemsCol("items").setMinSupport(0.05)
      .fit(baskets)
    model.freqItemsets
      .where(size(col("items")) <= 2)
      .select(array_join(sort_array(col("items")), ",").as("itemset"),
        col("freq"))
      .orderBy("itemset")
  }

  // ---- S16: hidden _metadata columns ----

  /** S16: the `_metadata` hidden struct — per-row file provenance
    * (file_path, row_index) surfaced by the scan itself, no extra cost.
    * This is how a 100 TB pipeline answers "which input file produced
    * this bad row" without side-channel bookkeeping. The check groups
    * rows by the partition value parsed OUT OF the file path and
    * reconciles against the table's own grouping (file names contain
    * nondeterministic task UUIDs, so the path-derived partition value is
    * the stable thing to compare).
    */
  val s16FileMetadata: Q = (s, d) => {
    val dir = new java.io.File("target/tmp/s16_meta").getAbsolutePath
    orders(s, d).select("o_orderkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
    s.read.parquet(dir)
      // partition values are percent-encoded in paths ('4-NOT%20SPECIFIED')
      .select(url_decode(regexp_extract(col("_metadata.file_path"),
        "o_orderpriority=([^/]+)", 1)).as("prio_from_path"))
      .groupBy("prio_from_path")
      .agg(count(lit(1)).as("n_rows"))
      .orderBy("prio_from_path")
  }

  // ---- M22: isotonic regression ----

  /** M22: isotonic regression — the monotone (pool-adjacent-violators)
    * fit used for score calibration. Spark's implementation sorts by
    * feature and PAVs per partition, then merges. The PAV solution is
    * UNIQUE for a given (x, y) multiset, and on the bounded distinct
    * feature grid it equals the minimax closed form
    * ŷ_i = max_{j≤i} min_{k≥i} mean(y_j..y_k) — so since round 11 the
    * MODEL's calibrated values are hash-checked against that formula
    * replayed in DuckDB (flipped from rows-only; monotonicity and
    * fit-quality laws stay in the spec). The minimax evaluation is
    * O(d³) in DISTINCT feature values (11 here; bounded by contract),
    * not in rows.
    */
  val m22Isotonic: Q = (s, d) => {
    val pts = lineitem(s, d)
      .select(col("l_discount").as("feature"),
        col("l_extendedprice").as("label"), lit(1.0).as("weight"))
    val model = new IsotonicRegression().setFeaturesCol("feature")
      .setLabelCol("label").fit(pts)
    model.transform(pts.select("feature", "label"))
      .groupBy("feature")
      .agg(r4(first(col("prediction"))).as("calibrated"),
        count(lit(1)).as("n"))
      .orderBy("feature")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "m21_fpgrowth" -> m21Fpgrowth,
    "s16_file_metadata" -> s16FileMetadata,
    "m22_isotonic" -> m22Isotonic)

  val oracleSql: Map[String, String] = Map(
    // PAVA's unique solution via the minimax closed form over the 11
    // distinct discount values; prefix sums make every range mean one
    // subtraction + one division.
    // ACCEPTED KNIFE-EDGE (ADVICE r11, same class as the lt71 note):
    // MLlib's float PAV pooling and this prefix-sum both sum raw
    // l_extendedprice doubles in engine-chosen order, so a pooled mean
    // landing exactly on an r4 rounding boundary at some SF could
    // differ by one ulp and flip the 1e-4 digit. Unfixable without
    // changing MLlib's fit input (quantizing the LABELS would change
    // what the operator computes); green at sf0.001/0.01/0.1 and
    // tripwired every round — if it ever flips, this note names why.
    "m22_isotonic" ->
      """WITH pts AS (
        |  SELECT l_discount AS feature,
        |    CAST(sum(l_extendedprice) AS DOUBLE) AS sy,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1),
        |pre AS (
        |  SELECT feature, n,
        |    CAST(row_number() OVER (ORDER BY feature) AS BIGINT) AS i,
        |    sum(sy) OVER (ORDER BY feature) AS cy,
        |    CAST(sum(n) OVER (ORDER BY feature) AS DOUBLE) AS cn,
        |    sum(sy) OVER (ORDER BY feature) - sy AS cyp,
        |    CAST(sum(n) OVER (ORDER BY feature) - n AS DOUBLE) AS cnp
        |  FROM pts),
        |pm AS (SELECT j.i AS j, k.i AS k, (k.cy - j.cyp) / (k.cn - j.cnp) AS m
        |       FROM pre j JOIN pre k ON k.i >= j.i),
        |mn AS (SELECT pm.j, i.i AS i, min(pm.m) AS mn
        |       FROM pm JOIN pre i ON pm.k >= i.i AND pm.j <= i.i
        |       GROUP BY 1, 2),
        |fit AS (SELECT i, max(mn) AS pred FROM mn GROUP BY 1)
        |SELECT o.feature, round(f.pred, 4) AS calibrated, o.n
        |FROM fit f JOIN pre o ON o.i = f.i ORDER BY feature""".stripMargin,
    "m21_fpgrowth" ->
      """WITH b AS (
        |  SELECT DISTINCT l_orderkey, l_returnflag || l_linestatus AS item
        |  FROM lineitem
        |),
        |n AS (SELECT count(DISTINCT l_orderkey) AS total FROM b),
        |i1 AS (SELECT item AS itemset, count(*) AS freq FROM b GROUP BY item),
        |i2 AS (
        |  SELECT a.item || ',' || c.item AS itemset, count(*) AS freq
        |  FROM b a JOIN b c
        |    ON a.l_orderkey = c.l_orderkey AND a.item < c.item
        |  GROUP BY 1
        |)
        |SELECT itemset, freq
        |FROM (SELECT * FROM i1 UNION ALL SELECT * FROM i2), n
        |WHERE freq >= CAST(ceiling(0.05 * total) AS BIGINT)
        |ORDER BY itemset""".stripMargin,
    "s16_file_metadata" ->
      """SELECT o_orderpriority AS prio_from_path, count(*) AS n_rows
        |FROM orders GROUP BY 1 ORDER BY prio_from_path""".stripMargin)
}
