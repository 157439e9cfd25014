package graft.queries

import org.apache.spark.ml.feature.StringIndexer
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.stat.ChiSquareTest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Orc, Tables}

/** Round-6 final surface batch: URL decomposition (web-corpus metadata
  * extraction), bounded edit-distance matching (entity resolution), and
  * the chi-square independence test (categorical drift/association
  * checks on corpus metadata).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.8 (scalar functions), §2.11 (ML stats).
  */
object SurfaceR6d extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- F17: URL functions ----

  /** F17: parse_url over deterministic synthetic URLs built from corpus
    * metadata — host / path / query-parameter extraction, the first step
    * of every web-corpus pipeline (domain-level aggregation, spam-domain
    * filtering, path-based routing). Narrow projection, codegen'd, no
    * shuffle; the oracle reconstructs each component from the same
    * source columns, so Spark's parser is checked against ground truth.
    */
  val f17UrlFuncs: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"),
        concat(lit("https://"), col("source"), lit(".example.com/docs/"),
          col("doc_id"), lit("?lang="), col("lang")).as("url"))
      .select(col("doc_id"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_param"))
      .orderBy("doc_id")

  // ---- F18: bounded edit distance ----

  /** F18: edit-distance self-match over nation names with a distance
    * bound — the fuzzy-key primitive behind entity resolution. The demo
    * runs the exact O(n²) pair scan (25×25 here); at 100 TB you block
    * first (length band, first-letter bucket, or q-gram LSH) and run
    * levenshtein only inside blocks — same scalar, bounded candidate
    * set. Spark's levenshtein(l, r[, threshold]) short-circuits beyond
    * the bound, which is the form to use inside blocks.
    */
  val f18EditDistance: Q = (s, d) => {
    val a = nation(s, d).select(col("n_nationkey").as("a_key"),
      col("n_name").as("a_name"))
    val b = nation(s, d).select(col("n_nationkey").as("b_key"),
      col("n_name").as("b_name"))
    a.join(b, col("a_key") < col("b_key"))
      .select(col("a_key"), col("b_key"),
        levenshtein(col("a_name"), col("b_name")).as("dist"))
      .where(col("dist") <= 5)
      .orderBy("a_key", "b_key")
  }

  // ---- M20: chi-square independence test ----

  /** M20: chi-square test of independence between l_returnflag and
    * l_linestatus — the categorical association / drift check run on
    * corpus metadata (is `source` independent of `lang`?). Spark builds
    * the contingency distributively (one hash agg); the statistic is
    * computed on the driver from the k×m table, which is tiny no matter
    * the row count. The oracle recomputes sum((O−E)²/E) over the FULL
    * category cross (unobserved cells contribute E).
    */
  val m20Chisquare: Q = (s, d) => {
    import s.implicits._
    val base = lineitem(s, d).select(col("l_returnflag"), col("l_linestatus"))
    val fIdx = new StringIndexer().setInputCol("l_returnflag")
      .setOutputCol("f").setStringOrderType("alphabetAsc")
    val lIdx = new StringIndexer().setInputCol("l_linestatus")
      .setOutputCol("l").setStringOrderType("alphabetAsc")
    val indexed = lIdx.fit(base).transform(fIdx.fit(base).transform(base))
      .select(array_to_vector(array(col("f"))).as("features"), col("l").as("label"))
    val r = ChiSquareTest.test(indexed, "features", "label").head
    val stat = r.getAs[org.apache.spark.ml.linalg.Vector]("statistics")(0)
    val dof = r.getAs[Seq[Int]]("degreesOfFreedom").head.toLong
    Seq((r4d(stat), dof)).toDF("statistic", "dof")
  }

  /** Scalar twin of [[Orc.r4]] for driver-side values. */
  private def r4d(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  // ---- Q17: exchange reuse ----

  /** Q17: one aggregation consumed twice — the plan computes the
    * groupBy ONCE and reuses its shuffle output for both branches
    * (ReusedExchange), instead of scanning + shuffling lineitem twice.
    * At 100 TB that halves the dominant cost of every
    * "same rollup, two filters" report; the PlanSpec asserts the reuse
    * node is actually present.
    */
  val q17ExchangeReuse: Q = (s, d) => {
    val base = lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(r4(sum(col("l_quantity"))).as("qty"), count(lit(1)).as("n"))
    val big = base.where(col("qty") > 150)
      .select(lit("big").as("side"), col("l_orderkey"), col("qty"), col("n"))
    val small = base.where(col("qty") < 30)
      .select(lit("small").as("side"), col("l_orderkey"), col("qty"), col("n"))
    big.union(small).orderBy("side", "l_orderkey")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "f17_url_funcs" -> f17UrlFuncs,
    "f18_edit_distance" -> f18EditDistance,
    "m20_chisquare" -> m20Chisquare,
    "q17_exchange_reuse" -> q17ExchangeReuse)

  val oracleSql: Map[String, String] = Map(
    "f17_url_funcs" ->
      """SELECT doc_id,
        |  source || '.example.com' AS host,
        |  '/docs/' || doc_id AS path,
        |  lang AS lang_param
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f18_edit_distance" ->
      """SELECT a.n_nationkey AS a_key, b.n_nationkey AS b_key,
        |  CAST(levenshtein(a.n_name, b.n_name) AS INTEGER) AS dist
        |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
        |WHERE levenshtein(a.n_name, b.n_name) <= 5
        |ORDER BY a_key, b_key""".stripMargin,
    "q17_exchange_reuse" ->
      """WITH base AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 4) AS qty, count(*) AS n
        |  FROM lineitem GROUP BY l_orderkey
        |)
        |SELECT 'big' AS side, l_orderkey, qty, n FROM base WHERE qty > 150
        |UNION ALL
        |SELECT 'small' AS side, l_orderkey, qty, n FROM base WHERE qty < 30
        |ORDER BY side, l_orderkey""".stripMargin,
    "m20_chisquare" ->
      """WITH ct AS (
        |  SELECT l_returnflag AS f, l_linestatus AS l, count(*) AS o
        |  FROM lineitem GROUP BY 1, 2
        |),
        |fx AS (SELECT DISTINCT l_returnflag AS f FROM lineitem),
        |lx AS (SELECT DISTINCT l_linestatus AS l FROM lineitem),
        |full_ct AS (
        |  SELECT fx.f, lx.l, coalesce(o, 0) AS o
        |  FROM fx CROSS JOIN lx LEFT JOIN ct ON ct.f = fx.f AND ct.l = lx.l
        |),
        |tot AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM full_ct),
        |rm AS (SELECT f, CAST(sum(o) AS DOUBLE) AS rf FROM full_ct GROUP BY f),
        |cm AS (SELECT l, CAST(sum(o) AS DOUBLE) AS cf FROM full_ct GROUP BY l)
        |SELECT
        |  round(sum((o - rf * cf / n) * (o - rf * cf / n) / (rf * cf / n)), 4)
        |    AS statistic,
        |  (SELECT CAST((count(*) - 1) AS BIGINT) FROM fx) *
        |  (SELECT CAST((count(*) - 1) AS BIGINT) FROM lx) AS dof
        |FROM full_ct JOIN rm ON full_ct.f = rm.f
        |  JOIN cm ON full_ct.l = cm.l, tot""".stripMargin)
}
