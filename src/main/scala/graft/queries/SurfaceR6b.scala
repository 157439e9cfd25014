package graft.queries

import org.apache.spark.ml.feature.{PCA, VectorAssembler}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.linalg.Matrix
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.{Orc, Tables}

/** Round-6 source/stat additions: the XML source surface (function and
  * file form), the binaryFile source (how raw media lands in a multimodal
  * pipeline before any decode), a distributed correlation matrix, and
  * PCA over the embedding corpus.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract rows
  * SURVEY.md §2.1 (sources), §2.11 (MLlib surface).
  */
object SurfaceR6b extends QueryBatch {
  import Orc.r4
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  // ---- S14: XML ----

  /** S14: XML scalar surface — to_xml serializes a struct per row,
    * from_xml parses it back against an explicit schema; the roundtrip
    * is projection-only (narrow, codegen'd, no shuffle), so it scales
    * like any parse: one pass over the data.
    */
  val s14Xml: Q = (s, d) => {
    val schema = StructType.fromDDL("k INT, nm STRING, r INT")
    nation(s, d)
      .select(col("n_nationkey"),
        to_xml(struct(col("n_nationkey").as("k"), col("n_name").as("nm"),
          col("n_regionkey").as("r"))).as("x"))
      .select(col("n_nationkey"), from_xml(col("x"), schema).as("p"))
      .select(col("n_nationkey"), col("p.k").as("k"), col("p.nm").as("nm"),
        col("p.r").as("r"))
      .orderBy("n_nationkey")
  }

  /** S14b: XML FILE source — write the table as XML documents, read it
    * back with an explicit rowTag + schema. Schema is declared, not
    * inferred, so the read plans one pass with no sampling job — the
    * only sane mode at 100 TB.
    */
  val s14bXmlFile: Q = (s, d) => {
    val dir = new java.io.File("target/tmp/s14b_xml").getAbsolutePath
    nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").option("rowTag", "nation").format("xml").save(dir)
    s.read.format("xml")
      .option("rowTag", "nation")
      .schema(StructType.fromDDL(
        "n_nationkey INT, n_name STRING, n_regionkey INT"))
      .load(dir)
      .orderBy("n_nationkey")
  }

  // ---- S15: binaryFile source ----

  /** S15: binaryFile source — how raw media (images/audio) enters a
    * multimodal pipeline: one row per file with (path, length, content).
    * The fixture files are deterministic seed-derived ASCII payloads so
    * the oracle can regenerate the identical bytes in SQL; the output
    * carries md5(content) rather than content so the compare is stable
    * and small. At 100 TB you'd pair this with
    * `spark.sql.files.maxPartitionBytes` sizing and push decode into
    * mapPartitions (operators/Multimodal.scala) — the scan side here is
    * already the scalable shape (a file-listing partitioned scan).
    */
  val s15Binaryfile: Q = (s, d) => {
    val dir = new java.io.File("target/tmp/s15_bin").getAbsolutePath
    new java.io.File(dir).mkdirs()
    val cs = "abcdefghijklmnop"
    (0 until 8).foreach { id =>
      val content = s"file-$id:" +
        (0 until 64).map(j => cs((id * 31 + j * 7) % 16)).mkString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f"$dir/bin_$id%02d.bin"),
        content.getBytes("UTF-8"))
    }
    s.read.format("binaryFile").load(dir)
      .select(element_at(split(col("path"), "/"), -1).as("fname"),
        col("length"), md5(col("content")).as("content_md5"))
      .orderBy("fname")
  }

  // ---- M18: correlation matrix ----

  private val corrCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** M18: Pearson correlation matrix over the lineitem measures — one
    * distributed pass (ml.stat.Correlation aggregates a Gram matrix per
    * partition, merges on the driver); only the upper triangle is
    * emitted. The matrix is k×k for k columns — tiny regardless of row
    * count, so this scales to any table that fits a single scan.
    */
  val m18CorrMatrix: Q = (s, d) => {
    import s.implicits._
    val va = new VectorAssembler().setInputCols(corrCols.toArray).setOutputCol("v")
    val df = va.transform(lineitem(s, d).select(corrCols.map(col): _*))
    val m = Correlation.corr(df, "v").head.getAs[Matrix](0)
    val rows = for {
      i <- corrCols.indices
      j <- corrCols.indices if i < j
    } yield (corrCols(i), corrCols(j), m(i, j))
    rows.toDF("x", "y", "c")
      .select(col("x"), col("y"), r4(col("c")).as("corr"))
      .orderBy("x", "y")
  }

  // ---- M17: PCA ----

  /** M17: PCA (k=2) over the 64-dim embedding corpus — the classic
    * dimensionality-reduction pass before visualization or cheap
    * clustering. Spark computes the covariance eigenbasis from one
    * distributed Gram-matrix aggregation; the transform is then a
    * broadcast matrix multiply per row. Signs of principal axes are
    * implementation-defined, so the registry output carries |loading|
    * (deterministic); the algebraic laws (orthonormality, variance
    * ordering, projection consistency) live in SurfaceR6Spec.
    */
  val m17Pca: Q = (s, d) => {
    val emb = embeddings(s, d)
      .select(col("vec_id"), array_to_vector(col("embedding")).as("v"))
    val model = new PCA().setK(2).setInputCol("v").setOutputCol("pc").fit(emb)
    model.transform(emb)
      .select(col("vec_id"), vector_to_array(col("pc")).as("p"))
      .select(col("vec_id"),
        r4(abs(col("p").getItem(0))).as("abs_pc1"),
        r4(abs(col("p").getItem(1))).as("abs_pc2"))
      .orderBy("vec_id")
  }

  // ---- registry ----

  val queries: Map[String, Q] = Map(
    "s14_xml" -> s14Xml,
    "s14b_xml_file" -> s14bXmlFile,
    "s15_binaryfile" -> s15Binaryfile,
    "m18_corr_matrix" -> m18CorrMatrix,
    "m17_pca" -> m17Pca)

  val oracleSql: Map[String, String] = Map(
    "s14_xml" ->
      """SELECT n_nationkey, n_nationkey AS k, n_name AS nm, n_regionkey AS r
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "s14b_xml_file" ->
      """SELECT n_nationkey, n_name, n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "s15_binaryfile" ->
      """WITH ids AS (SELECT unnest(range(8)) AS id),
        |body AS (
        |  SELECT id, 'file-' || id || ':' || array_to_string(
        |    list_transform(range(64),
        |      j -> substr('abcdefghijklmnop',
        |        CAST((id * 31 + j * 7) % 16 AS INTEGER) + 1, 1)), '') AS content
        |  FROM ids)
        |SELECT printf('bin_%02d.bin', id) AS fname,
        |  CAST(length(content) AS BIGINT) AS length,
        |  md5(content) AS content_md5
        |FROM body ORDER BY fname""".stripMargin,
    "m18_corr_matrix" -> corrCols.combinations(2).map { case Seq(a, b) =>
      s"SELECT '$a' AS x, '$b' AS y, round(corr($a, $b), 4) AS corr FROM lineitem"
    }.mkString("", " UNION ALL ", " ORDER BY x, y"))
}
