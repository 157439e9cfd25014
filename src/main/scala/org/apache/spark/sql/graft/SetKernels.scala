package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernel for set-overlap counting over SORTED string
  * arrays.
  *
  * The built-in route for an intersection count is
  * `size(array_intersect(a, b))`, which builds a per-row hash set of
  * UTF8Strings — measured 2.3× slower than the whole lj2 query's
  * explode-join verification it was meant to replace. When both inputs
  * are sorted (`sort_array(collect_list(tok))`), the count is a
  * two-pointer merge: no allocation, no hashing, binary UTF8 compares
  * only, inside whole-stage codegen. This turns set-similarity
  * verification from a (pairs × tokens) explode-join shuffle into a
  * per-row scalar op on pre-joined array payloads.
  *
  * CONTRACT: both arrays must be sorted ascending by Spark's
  * `sort_array` ordering (UTF8String binary order) and contain no
  * duplicates or nulls — exactly what `sort_array(collect_list(x))`
  * over per-key-distinct rows produces. Unsorted input silently
  * undercounts; the call sites own the invariant.
  *
  * Lives under `org.apache.spark.sql.graft` because `AbstractDataType`
  * and `ExpressionUtils` are `private[sql]`.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); capability
  * derives from SURVEY.md §2.10 (near-dup verification) and §2.13.
  */
object SetKernels {

  /** |a ∩ b| for sorted, distinct, null-free string arrays. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(StringType), ArrayType(StringType))
    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_count"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements(); val ny = y.numElements()
      var i = 0; var j = 0; var n = 0L
      while (i < nx && j < ny) {
        val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
      n
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val n = ctx.freshName("cnt")
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |int $i = 0; int $j = 0; long $n = 0L;
        |while ($i < $a.numElements() && $j < $b.numElements()) {
        |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
        |  if ($c == 0) { $n++; $i++; $j++; }
        |  else if ($c < 0) { $i++; } else { $j++; }
        |}
        |${ev.value} = $n;
        """.stripMargin)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  private def e(c: Column): Expression = ExpressionUtils.expression(c)

  def sortedIntersectCount(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectCount(e(a), e(b)))
}
