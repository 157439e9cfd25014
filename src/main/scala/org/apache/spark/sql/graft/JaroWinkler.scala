package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native codegen expression.
  *
  * Spark ships `levenshtein` but no Jaro family, and entity-resolution
  * verifiers (lf2/lf3) want both: Levenshtein counts edits, Jaro–Winkler
  * rewards shared prefixes — the right metric for name/label matching.
  * A Scala UDF would leave whole-stage codegen (boxing + serialization
  * per row on the blocked-pair verifier, the hot path of a fuzzy match
  * at scale); this expression stays inside the generated plan and calls
  * one static method per row, like the built-in `levenshtein` does.
  *
  * Semantics pinned to the textbook algorithm (Winkler 1990), verified
  * cell-by-cell against DuckDB's `jaro_winkler_similarity` (the oracle
  * engine) in JaroWinklerSpec:
  *  - match window `max(|s|,|t|)/2 - 1` (integer division, floor 0);
  *  - transpositions counted over matched sequences, halved as a double;
  *  - either side empty → 0.0 (including both empty, as DuckDB defines);
  *  - Winkler prefix boost `+ ℓ·0.1·(1−jaro)` with ℓ = common prefix
  *    capped at 4, applied only when jaro > 0.7 (boost threshold).
  *
  * Comparison is per BYTE of the UTF-8 encoding — identical to
  * per-character on ASCII fixtures and to DuckDB's byte-wise matching.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); capability
  * derives from SURVEY.md §2.10 (fuzzy matching family) and §4.2.
  */
object JaroWinkler {

  /** Static entry point shared by eval and generated code. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes
    val t = b.getBytes
    val ls = s.length
    val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    val window = math.max(0, math.max(ls, lt) / 2 - 1)
    val sMatch = new Array[Boolean](ls)
    val tMatch = new Array[Boolean](lt)
    var m = 0
    var i = 0
    while (i < ls) {
      val hi = math.min(lt - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (!found && j <= hi) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var mismatches = 0
    i = 0
    while (i < ls) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) mismatches += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / ls + md / lt + (md - mismatches / 2.0) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(ls, lt))
    while (prefix < maxPrefix && s(prefix) == t(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  case class JaroWinklerSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler"

    override def nullSafeEval(a: Any, b: Any): Any =
      similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"org.apache.spark.sql.graft.JaroWinkler.similarity($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }
}
