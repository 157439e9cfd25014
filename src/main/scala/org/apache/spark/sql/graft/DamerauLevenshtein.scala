package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** True Damerau–Levenshtein distance as a native codegen expression.
  *
  * Spark ships `levenshtein` (and its banded threshold form) but no
  * transposition-aware edit distance. For name/label matching the
  * difference is systematic, not cosmetic: a swapped adjacent pair
  * ("recieve" → "receive") costs 2 Levenshtein edits but is ONE typo,
  * so a Levenshtein-thresholded fuzzy join double-prices exactly the
  * most common human error class. This is the UNRESTRICTED distance
  * (Lowrance–Wagner 1975, the `da`-table algorithm) — edits may touch a
  * transposed pair again — not the cheaper OSA restriction; pinned to
  * DuckDB's `damerau_levenshtein` (the oracle engine), which makes the
  * same choice ("CA"→"ABC" = 2, where OSA says 3). Verified cell-by-cell
  * in SurfaceR11bSpec.
  *
  * Comparison is per BYTE of the UTF-8 encoding — identical to
  * per-character on ASCII fixtures and to DuckDB's byte-wise matching.
  * Cost is O(|s|·|t|) time and space per row: a kernel for SHORT keys
  * (names, labels, codes) on pre-blocked candidate pairs, same as the
  * lf2/lf3 verifiers. A Scala UDF would leave whole-stage codegen; this
  * expression calls one static method per row, like built-in
  * `levenshtein` does.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); capability
  * derives from SURVEY.md §2.10 (fuzzy matching family) and §4.2.
  */
object DamerauLevenshtein {

  /** Inputs beyond this many UTF-8 bytes per side are rejected loudly.
    * The unrestricted algorithm's transposition term reads row
    * `da(ch)` — arbitrarily far back — so the FULL (n+2)×(m+2) matrix
    * is irreducible (no rolling-rows variant exists, unlike plain
    * Levenshtein); at document lengths that is ~4·|s|·|t| bytes PER ROW
    * (two 10 KB strings ≈ 400 MB) and an executor OOM. The function is
    * registered globally, so the short-key contract is enforced here,
    * not left as a doc comment (ADVICE r11). 2 KB covers every
    * name/label/code key; document-scale similarity belongs to the
    * token-set family (lj2/lj3/lf6). */
  val MaxBytes = 2048

  /** Static entry point shared by eval and generated code. */
  def distance(a: UTF8String, b: UTF8String): Long = {
    val s = a.getBytes
    val t = b.getBytes
    val n = s.length
    val m = t.length
    if (n > MaxBytes || m > MaxBytes)
      throw new IllegalArgumentException(
        s"damerau_levenshtein: input exceeds $MaxBytes bytes ($n, $m) — " +
          "the unrestricted algorithm allocates O(|s|*|t|) per row; use the " +
          "token-set similarity operators for document-length inputs")
    if (n == 0) return m.toLong
    if (m == 0) return n.toLong
    // Lowrance–Wagner: d is (n+2)×(m+2) with a sentinel row/col of
    // maxDist; da(ch) = last row index where byte ch occurred in s.
    val maxDist = n + m
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = maxDist
    var i = 0
    while (i <= n) {
      d((i + 1) * w) = maxDist
      d((i + 1) * w + 1) = i
      i += 1
    }
    var j = 0
    while (j <= m) {
      d(j + 1) = maxDist
      d(w + j + 1) = j
      j += 1
    }
    val da = new Array[Int](256)
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = da(t(j - 1) & 0xff)
        val l = db
        val cost = if (s(i - 1) == t(j - 1)) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trn = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (trn < best) best = trn
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da(s(i - 1) & 0xff) = i
      i += 1
    }
    d((n + 1) * w + m + 1).toLong
  }

  case class DamerauLevenshteinDistance(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "damerau_levenshtein"

    override def nullSafeEval(a: Any, b: Any): Any =
      distance(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"org.apache.spark.sql.graft.DamerauLevenshtein.distance($a, $b)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }
}
