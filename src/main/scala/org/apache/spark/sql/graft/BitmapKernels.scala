package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native codegen membership test over the 4 KB bucket bitmaps Spark's
  * own `bitmap_construct_agg` / `bitmap_or_agg` build (one bucket =
  * 32768 bit positions; `bitmap_bucket_number` / `bitmap_bit_position`
  * map a value to its (bucket, position) pair). Spark ships the
  * BUILDERS and a popcount (`bitmap_count`) but no scalar membership
  * test — reading a bit back otherwise needs substring-on-binary
  * gymnastics that defeat codegen. This expression is the read side:
  * bit layout matches the builder's (`bytes[pos >> 3] & (1 << (pos &
  * 7))`, verified bit-for-bit against `bitmap_construct_agg` output in
  * DvBitmapSpec).
  *
  * Consumer: [[graft.operators.VersionedTable]]'s bitmap deletion-
  * vector masks — one (file, bucket, 4 KB bitmap) row covers 32768
  * deleted row positions, so a 30% delete of a billion-row table is
  * ~30 K mask rows instead of 300 M (the §19.1-thread-4 density
  * upgrade past the (path, pos) row mask).
  *
  * Lives under `org.apache.spark.sql.graft` because `ExpressionUtils`
  * is `private[sql]`.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); capability
  * derives from SURVEY.md §2.11 + VERDICT r14 item 1 / §19.1 thread 4.
  */
object BitmapKernels {

  /** true iff bit `pos` (0-based, 0..32767) is set in `bitmap`.
    * Positions beyond the bitmap's length read as false (an OR of
    * unequal-length bitmaps pads with zeros; so does this). */
  case class BitmapContains(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(BinaryType, LongType)
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bitmap_contains_bit"

    override def nullSafeEval(bmp: Any, posAny: Any): Any = {
      val bytes = bmp.asInstanceOf[Array[Byte]]
      val pos = posAny.asInstanceOf[Long]
      val byteIdx = (pos >> 3).toInt
      pos >= 0 && byteIdx < bytes.length &&
        ((bytes(byteIdx) & (1 << (pos & 7L).toInt)) != 0)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val byteIdx = ctx.freshName("byteIdx")
      nullSafeCodeGen(ctx, ev, (bmp, pos) => s"""
        |int $byteIdx = (int)($pos >> 3);
        |${ev.value} = $pos >= 0 && $byteIdx < $bmp.length &&
        |  (($bmp[$byteIdx] & (1 << (int)($pos & 7L))) != 0);
        |""".stripMargin)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): BitmapContains =
      copy(left = newLeft, right = newRight)
  }

  private def e(c: Column): Expression = ExpressionUtils.expression(c)

  def bitmapContainsBit(bitmap: Column, pos: Column): Column =
    ExpressionUtils.column(BitmapContains(e(bitmap), e(pos)))
}
