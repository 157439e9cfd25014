package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-8 batch 2: event-sequence analytics and distribution-drift
  * monitoring — the reporting layer a training-data pipeline runs over
  * its event logs and corpus shards.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2 (W window frames, A aggregates) and §2.13 (product
  * analytics / curation families).
  */
object SurfaceR8b extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** Q24: orders-in-flight per day by SWEEP LINE — the interval-overlap
    * counting shape (peak concurrency, occupancy, live connections).
    * The naive plan joins every interval against every day it covers
    * (O(rows × span) blowup); the scalable shape is the one here:
    * reduce each interval to two ±1 deltas, hash-aggregate deltas BY
    * DAY first (one shuffle, output = #days rows regardless of corpus
    * size), and only then run the running sum — the single-partition
    * window touches #days rows (~2.4 k for seven years), never the
    * fact table, so it costs the same at 100 TB as at sf0.001.
    * An order's open interval is [o_orderdate, greatest(o_orderdate,
    * max(l_shipdate))] — the greatest() guards the synthetic rows whose
    * shipments predate the order (291 at sf0.001), which would
    * otherwise invert the interval and corrupt the sweep. */
  val q24OpenOrders: Q = (s, d) => {
    val lastShip = lineitem(s, d).groupBy("l_orderkey")
      .agg(max(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")).as("ls_day"))
    val o = orders(s, d)
      .withColumn("od_day", expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"))
      .join(lastShip, col("o_orderkey") === col("l_orderkey"))
    // both sweep-line deltas from ONE pass over the join (guide §1.2):
    // the old unionAll re-ran the lineitem agg + orders join for each
    // branch; exploding a 2-struct array emits the identical multiset
    val deltas = o.select(explode(array(
        struct(col("od_day").as("day"), lit(1L).as("delta")),
        struct((greatest(col("ls_day"), col("od_day")) + 1L).as("day"),
          lit(-1L).as("delta")))).as("e"))
      .select(col("e.day").as("day"), col("e.delta").as("delta"))
    val daily = deltas.groupBy("day").agg(sum("delta").as("net"))
    val w = graft.Windows.bounded(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("n_open", sum("net").over(w))
      .select(col("day"), col("net"), col("n_open"))
      .orderBy("day")
  }

  /** Q25: first-order Markov transition matrix over per-user event
    * sequences — next-event probabilities, the path-analysis primitive
    * behind "what do users do after a click". One window pass keyed by
    * user (lead over (ts, event_id) — deterministic under timestamp
    * ties), then two hash aggregations keyed by the 16-cell (src, dst)
    * matrix; nothing in the plan grows with users, so the shape is flat
    * at any scale. Probability = n / Σ_dst n via a partition-total
    * window over the tiny counts relation. */
  val q25Markov: Q = (s, d) => {
    val e = events(s, d).select(
      col("user_id"), col("event_id"), col("event_type"),
      expr("unix_micros(ts)").as("tu"))
    val seq = Window.partitionBy("user_id").orderBy(col("tu"), col("event_id"))
    val pairs = e
      .withColumn("dst", lead(col("event_type"), 1).over(seq))
      .where(col("dst").isNotNull)
      .select(col("event_type").as("src"), col("dst"))
    val counts = pairs.groupBy("src", "dst").agg(count(lit(1)).as("n"))
    counts
      .withColumn("p",
        Orc.r4(col("n").cast("double") / sum("n").over(Window.partitionBy("src"))))
      .select(col("src"), col("dst"), col("n"), col("p"))
      .orderBy("src", "dst")
  }

  /** LT9: rolling z-score anomaly flags — value vs the mean/stddev of
    * the 20 PRIOR observations of the same event_type (frame excludes
    * the current row so an outlier cannot mask itself). The moments are
    * computed from INTEGER running sums over 1e-4-quantized values
    * (S = Σq, SS = Σq²; var ∝ 20·SS − S²): integer window sums are
    * exact and associative, so Spark and the oracle agree bit-for-bit
    * where float mean/stddev windows would drift by summation order —
    * the same reason the incremental form is safe to partial-aggregate
    * across executors at scale. Partitioned by event_type; at 100 TB
    * the partition key widens to (event_type, time-bucket) with a
    * 20-row overlap, the standard bounded-frame shard trick. */
  val lt9RollingZscore: Q = (s, d) => {
    val e = events(s, d)
      .select(col("event_id"), col("event_type"), col("value"),
        expr("unix_micros(ts)").as("tu"))
      .withColumn("q", expr("CAST(floor(value * 10000.0 + 0.5) AS BIGINT)"))
    val f = Window.partitionBy("event_type").orderBy(col("tu"), col("event_id"))
      .rowsBetween(-20, -1)
    val z =
      (lit(20L) * col("q") - col("s")).cast("double") /
        (lit(20.0) * sqrt(col("d").cast("double") / lit(380.0)))
    e.withColumn("n_f", count(lit(1)).over(f))
      .withColumn("s", sum(col("q")).over(f))
      .withColumn("ss", sum(col("q") * col("q")).over(f))
      .where(col("n_f") === 20L)
      .withColumn("d", lit(20L) * col("ss") - col("s") * col("s"))
      .where(col("d") > 0L && abs(z) > lit(3.0))
      .select(col("event_id"), col("event_type"), col("value"),
        Orc.r4(z).as("z"))
      .orderBy("event_type", "event_id")
  }

  /** LP25: corpus-mix drift between two deterministic md5 halves of the
    * corpus — per-language Jensen–Shannon divergence contributions, the
    * monitor a curation pipeline runs to prove a new ingest batch has
    * the same language mix as the corpus it joins (same md5-bucket
    * gate as lp10, so membership is reproducible on both engines and
    * across retries). Two grouped-count passes over a tiny (lang ×
    * half) matrix; the JS terms are per-lang non-negative (log-sum
    * inequality) and sum to ≤ ln 2. Shared SQL text: the exact same
    * string runs on Spark and DuckDB, rounding hand-written in the
    * floor form so the engines cannot diverge (SURVEY §5.3). */
  val lp25MixDrift: Q = (s, d) => {
    documents(s, d).createOrReplaceTempView("graft_r8b_docs")
    s.sql(mixDriftSql.replace("{T}", "graft_r8b_docs"))
  }

  /** Dialect-shared JS-drift text (see [[lp25MixDrift]]). */
  private val mixDriftSql: String =
    """WITH h AS (
      |  SELECT lang,
      |    ((instr('0123456789abcdef', substr(md5(doc_id || 'drift'), 1, 1)) - 1) * 16 +
      |     (instr('0123456789abcdef', substr(md5(doc_id || 'drift'), 2, 1)) - 1)) % 100 < 50
      |      AS in_a
      |  FROM {T}),
      |tot AS (
      |  SELECT CAST(count(*) FILTER (WHERE in_a) AS BIGINT) AS ta,
      |         CAST(count(*) FILTER (WHERE NOT in_a) AS BIGINT) AS tb
      |  FROM h),
      |c AS (
      |  SELECT lang,
      |    CAST(count(*) FILTER (WHERE in_a) AS BIGINT) AS na,
      |    CAST(count(*) FILTER (WHERE NOT in_a) AS BIGINT) AS nb
      |  FROM h GROUP BY lang),
      |p AS (
      |  SELECT lang, na, nb, na / ta AS pa, nb / tb AS pb
      |  FROM c CROSS JOIN tot),
      |t AS (
      |  SELECT lang, na, nb, pa, pb,
      |    5e-1 * (CASE WHEN na = 0 THEN 0e0
      |                ELSE pa * ln(pa / ((pa + pb) / 2e0)) END) +
      |    5e-1 * (CASE WHEN nb = 0 THEN 0e0
      |                ELSE pb * ln(pb / ((pa + pb) / 2e0)) END) AS term
      |  FROM p)
      |SELECT lang, na, nb,
      |  floor(pa * 1e4 + 5e-1) / 1e4 AS p_a,
      |  floor(pb * 1e4 + 5e-1) / 1e4 AS p_b,
      |  floor(term * 1e4 + 5e-1) / 1e4 AS js_term
      |FROM t ORDER BY lang""".stripMargin

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "q24_open_orders" -> q24OpenOrders,
    "q25_markov" -> q25Markov,
    "lt9_rolling_zscore" -> lt9RollingZscore,
    "lp25_mix_drift" -> lp25MixDrift)

  val oracleSql: Map[String, String] = Map(
    "q24_open_orders" ->
      """WITH last AS (
        |  SELECT l_orderkey, max(epoch_us(l_shipdate) // 86400000000) AS ls_day
        |  FROM lineitem GROUP BY l_orderkey),
        |o AS (
        |  SELECT epoch_us(o_orderdate) // 86400000000 AS od_day, ls_day
        |  FROM orders JOIN last ON o_orderkey = l_orderkey),
        |d AS (
        |  SELECT od_day AS day, CAST(1 AS BIGINT) AS delta FROM o
        |  UNION ALL
        |  SELECT greatest(ls_day, od_day) + 1, CAST(-1 AS BIGINT) FROM o),
        |g AS (SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM d GROUP BY day)
        |SELECT day, net,
        |  CAST(sum(net) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_open
        |FROM g ORDER BY day""".stripMargin,
    "q25_markov" ->
      """WITH s AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tu FROM events),
        |pr AS (
        |  SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS dst
        |  FROM s),
        |c AS (
        |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
        |  FROM pr WHERE dst IS NOT NULL GROUP BY src, dst)
        |SELECT src, dst, n,
        |  round(n / CAST(sum(n) OVER (PARTITION BY src) AS BIGINT), 4) AS p
        |FROM c ORDER BY src, dst""".stripMargin,
    "lt9_rolling_zscore" ->
      """WITH e AS (
        |  SELECT event_id, event_type, value, epoch_us(ts) AS tu,
        |    CAST(floor(value * 10000.0 + 0.5) AS BIGINT) AS q
        |  FROM events),
        |w AS (
        |  SELECT event_id, event_type, value, q,
        |    count(*) OVER f AS n_f,
        |    CAST(sum(q) OVER f AS BIGINT) AS s,
        |    CAST(sum(q * q) OVER f AS BIGINT) AS ss
        |  FROM e
        |  WINDOW f AS (PARTITION BY event_type ORDER BY tu, event_id
        |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT event_id, event_type, value,
        |    CAST(20 * q - s AS DOUBLE) /
        |      (20.0 * sqrt(CAST(20 * ss - s * s AS BIGINT) / 380.0)) AS zv
        |  FROM w WHERE n_f = 20 AND 20 * ss - s * s > 0)
        |SELECT event_id, event_type, value, round(zv, 4) AS z
        |FROM z WHERE abs(zv) > 3.0
        |ORDER BY event_type, event_id""".stripMargin,
    "lp25_mix_drift" -> mixDriftSql.replace("{T}", "documents"))
}
