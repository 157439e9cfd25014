package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** SparkSessionExtensions injector: exposes the vector kernels to SQL.
  *
  * Activate with
  * `.config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")`
  * on a fresh session (or `GraftExtensions.register(spark)` on a live
  * one); afterwards `SELECT cosine_sim(a.embedding, b.embedding) ...`
  * parses and plans like a built-in — the same codegen Expressions as the
  * Column API (`graft.functions.VectorFunctions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => CosineNormRewrite)
    ext.injectPlannerStrategy(_ => AsOfJoinNative.AsOfJoinStrategy)
    ext.injectResolutionRule(session => GraftChainRelation(session))
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(VectorKernels.getClass.getName, null,
      name, usage, "", "", "", "", "", "", "built-in")

  /** SQL builders receive UNRESOLVED expressions — eval() on a column or
    * subquery argument would throw an opaque runtime error (or evaluate
    * against no input). Require a foldable integer literal and fail
    * analysis with the function name otherwise (r02 ADVICE). */
  private def intLit(fn: String, arg: String, e: Expression): Int = {
    val ok = e.foldable && (e.dataType match {
      case _: IntegerType | _: LongType | _: ShortType | _: ByteType => true
      case _ => false
    })
    if (!ok) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "USER_RAISED_EXCEPTION",
        messageParameters = Map("errorMessage" ->
          s"$fn: argument '$arg' must be an integer literal, got ${e.sql}"))
    }
    e.eval().asInstanceOf[Number].intValue()
  }

  /** (identifier, info, builder) triples — one source of truth for both
    * the injector and live-session registration. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays"),
      (children: Seq[Expression]) =>
        VectorKernels.CosineSimilarity(children(0), children(1))),
    (FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float arrays"),
      (children: Seq[Expression]) =>
        VectorKernels.DotProduct(children(0), children(1))),
    (FunctionIdentifier("l2_norm"),
      info("l2_norm", "l2_norm(a) - Euclidean norm of a float array"),
      (children: Seq[Expression]) =>
        VectorKernels.L2Norm(children.head)),
    (FunctionIdentifier("heavy_hitters"),
      info("heavy_hitters",
        "heavy_hitters(col, capacity, k) - Misra-Gries approximate top-k terms"),
      (children: Seq[Expression]) =>
        HeavyHitters(children(0),
          intLit("heavy_hitters", "capacity", children(1)),
          intLit("heavy_hitters", "k", children(2)))),
    (FunctionIdentifier("top_k_by_score"),
      info("top_k_by_score",
        "top_k_by_score(score, tie, k) - map-side bounded-heap top-k per group"),
      (children: Seq[Expression]) =>
        TopKByScore(children(0), children(1),
          intLit("top_k_by_score", "k", children(2)))),
    (FunctionIdentifier("explode_ngrams"),
      info("explode_ngrams",
        "explode_ngrams(text, n) - one row per word n-gram (custom Generator)"),
      (children: Seq[Expression]) =>
        ExplodeNgrams(children(0), children(1))),
    // Spark ships distributed bloom build/probe expressions for its own
    // runtime row-level filtering but does not register them for users
    // (4.1: UNRESOLVED_ROUTINE). Surfacing them here gives queries the
    // semi-join-pushdown idiom directly: build the filter with a partial-
    // merged aggregate over the small side, probe it as a scan predicate
    // on the big side via a scalar subquery — the 100 TB shape for
    // "membership against a set that outgrows the broadcast threshold".
    (FunctionIdentifier("bloom_agg"),
      info("bloom_agg",
        "bloom_agg(xxhash64(col)[, est_items[, num_bits]]) - distributed bloom-filter build (binary)"),
      (children: Seq[Expression]) =>
        children match {
          case Seq(c) => new aggregate.BloomFilterAggregate(c)
          case Seq(c, n) => new aggregate.BloomFilterAggregate(c, n)
          case Seq(c, n, b) => new aggregate.BloomFilterAggregate(c, n, b)
          case _ => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "USER_RAISED_EXCEPTION",
            messageParameters = Map("errorMessage" ->
              "bloom_agg expects 1 to 3 arguments"))
        }),
    (FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler string similarity in [0,1]"),
      (children: Seq[Expression]) =>
        JaroWinkler.JaroWinklerSimilarity(children(0), children(1))),
    (FunctionIdentifier("damerau_levenshtein"),
      info("damerau_levenshtein",
        "damerau_levenshtein(a, b) - unrestricted Damerau-Levenshtein edit distance"),
      (children: Seq[Expression]) =>
        DamerauLevenshtein.DamerauLevenshteinDistance(children(0), children(1))),
    (FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(bloom, xxhash64(col)) - bloom-filter probe; false => definitely absent"),
      (children: Seq[Expression]) =>
        BloomFilterMightContain(children(0), children(1))))

  /** Register the kernel functions on an already-running session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
