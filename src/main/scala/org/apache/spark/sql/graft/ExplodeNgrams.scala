package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator` (SURVEY.md §2.12 X3, full-custom tier):
  * `explode_ngrams(text, n)` emits one output row per word n-gram of a
  * whitespace-tokenized text column — the UDTF mechanism itself, not a
  * composition of built-in explode/transform.
  *
  * Tokenization matches the L8 route (split on single space, trailing
  * empties kept) so the same DuckDB oracle verifies both. Evaluation is
  * interpreted ([[CodegenFallback]]) — `GenerateExec` calls `eval` per
  * input row and streams the returned iterator; generators are lazy
  * per-row expansions, so no buffering grows with input size and the
  * operator is safe at any scale. Registered in [[GraftExtensions]].
  */
case class ExplodeNgrams(text: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n)

  override def prettyName: String = "explode_ngrams"

  override def elementSchema: StructType =
    StructType(StructField("ngram", StringType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (text.dataType != StringType) {
      TypeCheckResult.TypeCheckFailure(
        s"explode_ngrams: text must be STRING, got ${text.dataType.sql}")
    } else if (n.dataType != IntegerType || !n.foldable) {
      TypeCheckResult.TypeCheckFailure(
        "explode_ngrams: n must be an INT literal")
    } else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val nVal: Int = n.eval().asInstanceOf[Number].intValue()

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null || nVal <= 0) Iterator.empty
    else {
      val toks = t.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < nVal) Iterator.empty
      else (0 to toks.length - nVal).iterator.map { i =>
        InternalRow(UTF8String.fromString(
          toks.slice(i, i + nVal).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), n = newChildren(1))
}
