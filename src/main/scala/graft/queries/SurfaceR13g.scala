package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-13 surface batch 7: frequent-itemset mining with an EXACT
  * oracle — unusual for the M-family, whose model fits are mostly
  * spec-checked (float iteration): FP-Growth emits exact support
  * COUNTS, so size-≤2 itemsets hash-check against plain SQL
  * aggregation (singletons = a GROUP BY, pairs = a within-basket
  * self-join).
  *
  * Scale shape: FP-Growth (Han/Pei/Yin 2000; MLlib's PFP variant,
  * Li et al. 2008) builds per-partition conditional FP-trees over a
  * group-id partitioned item space — one shuffle on the item group,
  * never the basket cross-product. The oracle's pair self-join is the
  * quadratic-in-basket-size brute form (fine at oracle SF; the
  * operator is the scale path).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract
  * area SURVEY.md §2 M-rows.
  */
object SurfaceR13g extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** M214: market-basket mining over order line items (parts folded
    * mod 50 to densify co-occurrence). minSupport 2% — the minCount
    * threshold is the SAME double expression MLlib evaluates
    * (ceil(0.02d · numBaskets)), and the oracle casts its literal to
    * DOUBLE for bit-identical IEEE boundary behavior (DuckDB's bare
    * 0.02 is DECIMAL — exact arithmetic can land on the other side of
    * the ceil when 0.02·N is near-integral). Output: size-1 and
    * size-2 itemsets canonicalized as (item_a, item_b = −1 for
    * singletons), with exact frequencies. */
  val m214FpgrowthPairs: Q = (s, d) => {
    val baskets = lineitem(s, d)
      .select(col("l_orderkey"), (col("l_partkey") % 50).cast("int").as("it"))
      .distinct()
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("it"))).as("items"))
    val fp = new org.apache.spark.ml.fpm.FPGrowth()
      .setItemsCol("items").setMinSupport(0.02).setMinConfidence(0.5)
    val model = fp.fit(baskets)
    model.freqItemsets
      .where(size(col("items")) <= 2)
      .select(sort_array(col("items")).as("its"), col("freq"))
      .select(
        element_at(col("its"), 1).as("item_a"),
        coalesce(expr("try_element_at(its, 2)"), lit(-1)).as("item_b"),
        col("freq"))
      .orderBy("item_a", "item_b")
  }

  val queries: Map[String, Q] = Map(
    "m214_fpgrowth_pairs" -> m214FpgrowthPairs)

  val oracleSql: Map[String, String] = Map(
    "m214_fpgrowth_pairs" ->
      """WITH baskets AS (
        |  SELECT DISTINCT l_orderkey, CAST(l_partkey % 50 AS INTEGER) AS it
        |  FROM lineitem),
        |n AS (SELECT count(DISTINCT l_orderkey) AS nb FROM baskets),
        |minc AS (
        |  SELECT CAST(ceil(CAST(0.02 AS DOUBLE) * nb) AS BIGINT) AS mc FROM n),
        |singles AS (
        |  SELECT it AS item_a, -1 AS item_b, CAST(count(*) AS BIGINT) AS freq
        |  FROM baskets GROUP BY it
        |  HAVING count(*) >= (SELECT mc FROM minc)),
        |pairs AS (
        |  SELECT a.it AS item_a, b.it AS item_b, CAST(count(*) AS BIGINT) AS freq
        |  FROM baskets a JOIN baskets b
        |    ON a.l_orderkey = b.l_orderkey AND a.it < b.it
        |  GROUP BY a.it, b.it
        |  HAVING count(*) >= (SELECT mc FROM minc))
        |SELECT item_a, item_b, freq FROM singles
        |UNION ALL
        |SELECT item_a, item_b, freq FROM pairs
        |ORDER BY item_a, item_b""".stripMargin)
}
