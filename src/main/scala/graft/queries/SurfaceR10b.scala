package graft.queries

import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.{Orc, Tables}

/** Round-10 surface batch 2: the XML source/function family (native in
  * Spark 4), the remaining small MLlib feature transformers — each one
  * SQL-expressible and therefore oracle-checked, not just spec'd — the
  * GLR fit whose gaussian/identity case has an exact closed-form SQL
  * oracle (`regr_slope`/`regr_intercept`), the remaining seeded
  * classifier fits (LinearSVC, MLP, DecisionTree — law-spec'd like
  * m4/m12), and the PII-redaction text operator for the LLM-pipeline
  * family.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract areas
  * SURVEY.md §2.1 (sources), §2.8 (scalar functions), §2.10 (LLM
  * pipeline), §2.11 (ML surface).
  */
object SurfaceR10b extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** S20: XML FILE SOURCE/SINK roundtrip — Spark 4 ships the (donated
    * spark-xml) reader/writer natively. Write the 3-column nation
    * projection as one XML doc per partition (`<nations><nation>…`),
    * read it back with an explicit schema. Scale: the XML reader splits
    * by rowTag like json/csv readers split by line — a multi-file
    * landing zone parallelizes per file; schema is explicit so no
    * inference pass over 100 TB. */
  val s20XmlFile: Q = (s, d) => {
    val out = new java.io.File("target/tmp/s20_xml").getAbsolutePath
    nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").format("xml")
      .option("rowTag", "nation").option("rootTag", "nations").save(out)
    s.read.format("xml")
      .option("rowTag", "nation")
      .schema(StructType.fromDDL(
        "n_nationkey INT, n_name STRING, n_regionkey INT"))
      .load(out)
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")
  }

  /** F27: XML SCALAR FUNCTIONS — `to_xml(struct(..))` renders each row
    * as an XML fragment, `from_xml` parses it back against an explicit
    * schema; the roundtrip must be the identity, so the oracle is a
    * plain projection. Both are codegen-free ExpressionWithOptions but
    * per-row narrow — no shuffle, scales linearly. */
  val f27XmlFuncs: Q = (s, d) => {
    val schema = StructType.fromDDL("o_orderkey BIGINT, o_orderpriority STRING")
    orders(s, d)
      .select(to_xml(struct(col("o_orderkey"), col("o_orderpriority"))).as("x"))
      .select(from_xml(col("x"), schema).as("r"))
      .select(col("r.o_orderkey").as("o_orderkey"),
        col("r.o_orderpriority").as("o_orderpriority"))
      .orderBy("o_orderkey")
  }

  /** M55: Interaction — the pairwise-product feature transformer:
    * vector [l_quantity, l_discount] × scalar l_extendedprice →
    * [q·p, d·p]. Pure narrow map; oracle is the literal products. */
  val m55Interaction: Q = (s, d) => {
    val base = lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity"), col("l_discount"), col("l_extendedprice"))
    val va = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("l_quantity", "l_discount")).setOutputCol("qd")
    val inter = new org.apache.spark.ml.feature.Interaction()
      .setInputCols(Array("qd", "l_extendedprice")).setOutputCol("f")
    inter.transform(va.transform(base))
      .select(col("l_orderkey"), col("l_linenumber"),
        r4(element_at(vector_to_array(col("f")), 1)).as("qp"),
        r4(element_at(vector_to_array(col("f")), 2)).as("dp"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** M56: VectorSlicer — index-select [0, 3, 7] out of the 64-dim
    * embedding. Narrow projection; the oracle is 1-based list indexing
    * on the DuckDB side. */
  val m56VectorSlicer: Q = (s, d) => {
    val base = embeddings(s, d).select(
      col("vec_id"), array_to_vector(col("embedding")).as("v"))
    val sl = new org.apache.spark.ml.feature.VectorSlicer()
      .setInputCol("v").setOutputCol("sv").setIndices(Array(0, 3, 7))
    sl.transform(base)
      .select(col("vec_id"),
        r4(element_at(vector_to_array(col("sv")), 1)).as("e0"),
        r4(element_at(vector_to_array(col("sv")), 2)).as("e3"),
        r4(element_at(vector_to_array(col("sv")), 3)).as("e7"))
      .orderBy("vec_id")
  }

  /** M57: ElementwiseProduct — Hadamard product with a fixed scaling
    * vector over the first 4 embedding dims. Narrow map; literal-product
    * oracle. */
  val m57ElementwiseProduct: Q = (s, d) => {
    val base = embeddings(s, d).select(
      col("vec_id"), array_to_vector(slice(col("embedding"), 1, 4)).as("v"))
    val ep = new org.apache.spark.ml.feature.ElementwiseProduct()
      .setInputCol("v").setOutputCol("w")
      .setScalingVec(org.apache.spark.ml.linalg.Vectors.dense(0.5, -1.0, 2.0, 0.25))
    ep.transform(base)
      .select(col("vec_id"),
        r4(element_at(vector_to_array(col("w")), 1)).as("w0"),
        r4(element_at(vector_to_array(col("w")), 2)).as("w1"),
        r4(element_at(vector_to_array(col("w")), 3)).as("w2"),
        r4(element_at(vector_to_array(col("w")), 4)).as("w3"))
      .orderBy("vec_id")
  }

  /** M58: StringIndexer → IndexToString roundtrip — decode predicted
    * indices back to labels. Whatever index order the fit chose, the
    * roundtrip is the identity on the input column, which is exactly
    * what the oracle asserts. Fit state is the label array (broadcast
    * scalar); transform is narrow. */
  val m58IndexToString: Q = (s, d) => {
    val base = customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val idx = new org.apache.spark.ml.feature.StringIndexer()
      .setInputCol("c_mktsegment").setOutputCol("seg_idx")
    val model = idx.fit(base)
    val its = new org.apache.spark.ml.feature.IndexToString()
      .setInputCol("seg_idx").setOutputCol("seg_rt")
      .setLabels(model.labelsArray(0))
    its.transform(model.transform(base))
      .select(col("c_custkey"), col("seg_rt"))
      .orderBy("c_custkey")
  }

  /** M59: SQLTransformer — a SQL statement as a pipeline stage
    * (`__THIS__` placeholder). The statement itself is plain Catalyst,
    * so anything it can say scales like the equivalent query. */
  val m59SqlTransformer: Q = (s, d) => {
    val st = new org.apache.spark.ml.feature.SQLTransformer()
      .setStatement(
        "SELECT c_custkey, c_acctbal * 1.1 AS boosted FROM __THIS__")
    st.transform(customer(s, d))
      .select(col("c_custkey"), r4(col("boosted")).as("boosted"))
      .orderBy("c_custkey")
  }

  /** M60: GeneralizedLinearRegression, gaussian family / identity link,
    * regParam 0 — the one GLM whose fit has a CLOSED-FORM oracle: the
    * IRLS solution equals OLS, i.e. `regr_slope`/`regr_intercept`.
    * The only oracle-checked model FIT in the registry (model outputs
    * are otherwise law-spec'd per SURVEY §5.3). Fit is one pass of
    * treeAggregate normal equations at this width. */
  val m60GlrGaussian: Q = (s, d) => {
    val base = lineitem(s, d).select(
      col("l_quantity"), col("l_extendedprice"))
    val va = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("l_quantity")).setOutputCol("features")
    val glr = new org.apache.spark.ml.regression.GeneralizedLinearRegression()
      .setFamily("gaussian").setLink("identity").setRegParam(0.0)
      .setFeaturesCol("features").setLabelCol("l_extendedprice")
    val m = glr.fit(va.transform(base))
    s.range(1).select(
      r4(lit(m.coefficients(0))).as("slope"),
      r4(lit(m.intercept)).as("intercept"))
  }

  /** LT15: PII REDACTION — the text-scrubbing operator every training
    * pipeline runs before anything else. The fixture corpus is clean
    * synthetic text, so the contact line is CONSTRUCTED deterministically
    * from fixture columns (first word @ source, zero-padded extension)
    * on BOTH engines, then redacted with RE2-and-Java-compatible
    * patterns; counts come from `regexp_extract_all`. Narrow per-row
    * regex — scales linearly, no shuffle. */
  val lt15PiiRedact: Q = (s, d) => {
    val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
    val phone = """555-[0-9]{4}"""
    documents(s, d)
      .where(length(col("text")) > 0)
      .select(col("doc_id"),
        concat(
          element_at(split(col("text"), " "), 1), lit("@"), col("source"),
          lit(".com ph 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" "), col("text")).as("msg"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("msg"), lit(email), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("msg"), lit(phone), lit(0)))
          .cast("long").as("n_phones"),
        regexp_replace(regexp_replace(col("msg"), email, "<EMAIL>"),
          phone, "<PHONE>").as("redacted"))
      .orderBy("doc_id")
  }

  /** LT16: TEXT NORMALIZATION — the canonicalization pass that precedes
    * hashing/dedup in every training pipeline: lowercase, strip
    * non-alphanumerics (keeping spaces), collapse whitespace runs, trim.
    * Output carries the normalized text and its post-normalization token
    * count. Narrow per-row regex; scales linearly. */
  val lt16TextNormalize: Q = (s, d) => {
    documents(s, d)
      .where(length(col("text")) > 0)
      .select(col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")).as("norm"))
      .select(col("doc_id"), col("norm"),
        when(length(col("norm")) === 0, lit(0L))
          .otherwise(size(split(col("norm"), " ")).cast("long"))
          .as("n_tokens"))
      .orderBy("doc_id")
  }

  /** M61 (rows-only): LinearSVC — hinge-loss linear binary classifier
    * on the embeddings (label parity as the binary target). Seeded fit;
    * separability law in SurfaceR10bSpec; output is the prediction
    * histogram (deterministic given the fit). */
  val m61LinearSvc: Q = (s, d) => {
    val feats = embeddings(s, d).select(
      (col("label") % 2).cast("double").as("label"),
      array_to_vector(col("embedding")).as("features"))
    val svc = new org.apache.spark.ml.classification.LinearSVC()
      .setMaxIter(20).setRegParam(0.01)
      .setFeaturesCol("features").setLabelCol("label")
    // copy() drops trainingSummary — the summary pins the SparkSession
    // and the transform UDF's closure would otherwise drag it into task
    // serialization (fails whenever the session isn't closure-cleanable,
    // e.g. once an Observation is registered).
    svc.fit(feats).copy(org.apache.spark.ml.param.ParamMap.empty)
      .transform(feats)
      .groupBy(col("prediction").cast("int").as("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("pred")
  }

  /** M62 (rows-only): MultilayerPerceptronClassifier — 64→16→10 softmax
    * network, seeded. Distributed L-BFGS over treeAggregate gradients —
    * the fit shape scales with the data, the model state is KB-sized.
    * Accuracy law on blobs in SurfaceR10bSpec. */
  val m62Mlp: Q = (s, d) => {
    val feats = graft.ml.Pipelines.embeddingFeatures(embeddings(s, d))
    val mlp = new org.apache.spark.ml.classification.MultilayerPerceptronClassifier()
      .setLayers(Array(64, 16, 10)).setMaxIter(30).setSeed(42L)
      .setFeaturesCol("features").setLabelCol("label")
    // copy() drops trainingSummary (see m61)
    mlp.fit(feats).copy(org.apache.spark.ml.param.ParamMap.empty)
      .transform(feats)
      .groupBy(col("prediction").cast("int").as("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("pred")
  }

  /** M63 (rows-only): FeatureHasher — the stateless hashing-trick
    * encoder (murmur3 → 64 buckets) over a categorical + numeric pair.
    * No fit pass at all, which is why a 100 TB pipeline reaches for it
    * over StringIndexer/OHE; hash identity is engine-specific, so the
    * registry row is the hashed-vector SHAPE (nnz and index checksum)
    * and determinism is the spec law. */
  val m63FeatureHasher: Q = (s, d) => {
    val fh = new org.apache.spark.ml.feature.FeatureHasher()
      .setInputCols(Array("c_mktsegment", "c_nationkey"))
      .setOutputCol("f").setNumFeatures(64)
    fh.transform(customer(s, d))
      .select(col("c_custkey"), vector_to_array(col("f")).as("arr"))
      .select(col("c_custkey"),
        size(filter(col("arr"), x => x =!= 0.0)).cast("long").as("nnz"),
        aggregate(
          zip_with(col("arr"), sequence(lit(0), lit(63)),
            (v, i) => when(v =!= 0.0, i).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("long").as("idx_sum"))
      .orderBy("c_custkey")
  }

  /** M64: DCT-II of the first 8 embedding dims — oracle-checked since
    * round 11: MLlib's FFT-based transform is hash-compared against the
    * orthogonal closed form c_k = s_k·Σ x_j·cos(π(2j+1)k/2n) replayed
    * in DuckDB (the inverse-roundtrip law idct(dct(x)) = x stays in
    * SurfaceR10bSpec). Narrow map. */
  val m64Dct: Q = (s, d) => {
    val base = embeddings(s, d).select(
      col("vec_id"), array_to_vector(slice(col("embedding"), 1, 8)).as("v"))
    val dct = new org.apache.spark.ml.feature.DCT()
      .setInputCol("v").setOutputCol("c").setInverse(false)
    dct.transform(base)
      .select(col("vec_id"),
        r4(element_at(vector_to_array(col("c")), 1)).as("c0"),
        r4(element_at(vector_to_array(col("c")), 2)).as("c1"),
        r4(element_at(vector_to_array(col("c")), 3)).as("c2"))
      .orderBy("vec_id")
  }

  /** M65 (rows-only): standalone DecisionTreeClassifier (depth 5) — the
    * single-tree base learner under m12's forest and m25's GBT, exposed
    * directly. Seeded; accuracy law on blobs in the spec. */
  val m65DecisionTree: Q = (s, d) => {
    val feats = graft.ml.Pipelines.embeddingFeatures(embeddings(s, d))
    val dt = new org.apache.spark.ml.classification.DecisionTreeClassifier()
      .setMaxDepth(5).setSeed(42L)
      .setFeaturesCol("features").setLabelCol("label")
    dt.fit(feats).transform(feats)
      .groupBy(col("prediction").cast("int").as("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("pred")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "s20_xml_file" -> s20XmlFile,
    "f27_xml_funcs" -> f27XmlFuncs,
    "m55_interaction" -> m55Interaction,
    "m56_vector_slicer" -> m56VectorSlicer,
    "m57_elementwise_product" -> m57ElementwiseProduct,
    "m58_index_to_string" -> m58IndexToString,
    "m59_sql_transformer" -> m59SqlTransformer,
    "m60_glr_gaussian" -> m60GlrGaussian,
    "lt15_pii_redact" -> lt15PiiRedact,
    "lt16_text_normalize" -> lt16TextNormalize,
    "m61_linear_svc" -> m61LinearSvc,
    "m62_mlp" -> m62Mlp,
    "m63_feature_hasher" -> m63FeatureHasher,
    "m64_dct" -> m64Dct,
    "m65_decision_tree" -> m65DecisionTree)

  val oracleSql: Map[String, String] = Map(
    // orthogonal DCT-II closed form (s0 = sqrt(1/n), sk = sqrt(2/n)):
    // pins MLlib's FFT-based transform cell-by-cell (flipped from
    // rows-only in round 11; the roundtrip law stays in the spec)
    "m64_dct" ->
      """SELECT vec_id,
        |  round(sqrt(1.0/8) * (CAST(embedding[1] AS DOUBLE) * cos(pi() * 1 * 0 / 16.0) + CAST(embedding[2] AS DOUBLE) * cos(pi() * 3 * 0 / 16.0) + CAST(embedding[3] AS DOUBLE) * cos(pi() * 5 * 0 / 16.0) + CAST(embedding[4] AS DOUBLE) * cos(pi() * 7 * 0 / 16.0) + CAST(embedding[5] AS DOUBLE) * cos(pi() * 9 * 0 / 16.0) + CAST(embedding[6] AS DOUBLE) * cos(pi() * 11 * 0 / 16.0) + CAST(embedding[7] AS DOUBLE) * cos(pi() * 13 * 0 / 16.0) + CAST(embedding[8] AS DOUBLE) * cos(pi() * 15 * 0 / 16.0)), 4) AS c0,
        |  round(sqrt(2.0/8) * (CAST(embedding[1] AS DOUBLE) * cos(pi() * 1 * 1 / 16.0) + CAST(embedding[2] AS DOUBLE) * cos(pi() * 3 * 1 / 16.0) + CAST(embedding[3] AS DOUBLE) * cos(pi() * 5 * 1 / 16.0) + CAST(embedding[4] AS DOUBLE) * cos(pi() * 7 * 1 / 16.0) + CAST(embedding[5] AS DOUBLE) * cos(pi() * 9 * 1 / 16.0) + CAST(embedding[6] AS DOUBLE) * cos(pi() * 11 * 1 / 16.0) + CAST(embedding[7] AS DOUBLE) * cos(pi() * 13 * 1 / 16.0) + CAST(embedding[8] AS DOUBLE) * cos(pi() * 15 * 1 / 16.0)), 4) AS c1,
        |  round(sqrt(2.0/8) * (CAST(embedding[1] AS DOUBLE) * cos(pi() * 1 * 2 / 16.0) + CAST(embedding[2] AS DOUBLE) * cos(pi() * 3 * 2 / 16.0) + CAST(embedding[3] AS DOUBLE) * cos(pi() * 5 * 2 / 16.0) + CAST(embedding[4] AS DOUBLE) * cos(pi() * 7 * 2 / 16.0) + CAST(embedding[5] AS DOUBLE) * cos(pi() * 9 * 2 / 16.0) + CAST(embedding[6] AS DOUBLE) * cos(pi() * 11 * 2 / 16.0) + CAST(embedding[7] AS DOUBLE) * cos(pi() * 13 * 2 / 16.0) + CAST(embedding[8] AS DOUBLE) * cos(pi() * 15 * 2 / 16.0)), 4) AS c2
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "s20_xml_file" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "f27_xml_funcs" ->
      """SELECT o_orderkey, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "m55_interaction" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_quantity * l_extendedprice, 4) AS qp,
        |  round(l_discount * l_extendedprice, 4) AS dp
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "m56_vector_slicer" ->
      """SELECT vec_id,
        |  round(CAST(embedding[1] AS DOUBLE), 4) AS e0,
        |  round(CAST(embedding[4] AS DOUBLE), 4) AS e3,
        |  round(CAST(embedding[8] AS DOUBLE), 4) AS e7
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "m57_elementwise_product" ->
      """SELECT vec_id,
        |  round(CAST(embedding[1] AS DOUBLE) * 0.5, 4)  AS w0,
        |  round(CAST(embedding[2] AS DOUBLE) * -1.0, 4) AS w1,
        |  round(CAST(embedding[3] AS DOUBLE) * 2.0, 4)  AS w2,
        |  round(CAST(embedding[4] AS DOUBLE) * 0.25, 4) AS w3
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "m58_index_to_string" ->
      """SELECT c_custkey, c_mktsegment AS seg_rt
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "m59_sql_transformer" ->
      """SELECT c_custkey, round(c_acctbal * 1.1, 4) AS boosted
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "m60_glr_gaussian" ->
      """SELECT
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
        |FROM lineitem""".stripMargin,
    "lt16_text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents WHERE len(text) > 0)
        |SELECT doc_id, norm,
        |  CASE WHEN len(norm) = 0 THEN 0
        |       ELSE CAST(len(string_split(norm, ' ')) AS BIGINT) END AS n_tokens
        |FROM n ORDER BY doc_id""".stripMargin,
    "lt15_pii_redact" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    split_part(text, ' ', 1) || '@' || source || '.com ph 555-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || text AS msg
        |  FROM documents WHERE len(text) > 0)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(msg,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(msg, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  regexp_replace(regexp_replace(msg,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |FROM m ORDER BY doc_id""".stripMargin)
}
