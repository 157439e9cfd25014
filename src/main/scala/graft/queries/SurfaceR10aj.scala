package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-10 surface batch 36: the schema contract check — the ingest
  * gate that fails a feed BEFORE a silent column rename or type drift
  * poisons everything downstream (the lp35 value rules assume the
  * schema already holds; this is the layer under them).
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract area
  * SURVEY.md §2.11 (pipeline utilities).
  */
object SurfaceR10aj extends QueryBatch {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  private val expected = Seq(
    ("doc_id", "bigint"), ("text", "string"), ("lang", "string"),
    ("source", "string"), ("n_chars", "bigint"))

  /** LP51: SCHEMA CONTRACT — the documents feed's ACTUAL schema
    * (introspected from the DataFrame, ordinal + name + type) joined
    * against the expected contract, one row per expected column with
    * a match verdict. Contract-as-data: the same relation a catalog
    * UI renders and a CI gate asserts on. Pure metadata — no table
    * scan at all (the plan is a local relation). */
  val lp51SchemaContract: Q = (s, d) => {
    import s.implicits._
    val actual = documents(s, d).schema.fields.zipWithIndex.map {
      case (f, i) => (i + 1, f.name, f.dataType.simpleString)
    }.toSeq
    val exp = expected.zipWithIndex.map { case ((n, t), i) => (i + 1, n, t) }
    val act = actual.toDF("pos", "col_name", "actual_type")
    exp.toDF("pos", "col_name", "expected_type")
      .join(act, Seq("pos", "col_name"), "left")
      .select(col("pos"), col("col_name"), col("expected_type"),
        coalesce(col("actual_type"), lit("MISSING")).as("actual_type"),
        (coalesce(col("actual_type"), lit("")) === col("expected_type"))
          .as("ok"))
      .orderBy("pos")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "lp51_schema_contract" -> lp51SchemaContract)

  val oracleSql: Map[String, String] = Map(
    // the contract itself is the oracle: expected rows, all ok, with
    // the parquet physical types the fixture carries
    "lp51_schema_contract" ->
      """SELECT * FROM (VALUES
        |  (1, 'doc_id', 'bigint', 'bigint', true),
        |  (2, 'text', 'string', 'string', true),
        |  (3, 'lang', 'string', 'string', true),
        |  (4, 'source', 'string', 'string', true),
        |  (5, 'n_chars', 'bigint', 'bigint', true))
        |  AS t(pos, col_name, expected_type, actual_type, ok)
        |ORDER BY pos""".stripMargin)
}
