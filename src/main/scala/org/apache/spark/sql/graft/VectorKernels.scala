package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native codegen kernels for dense-vector math over `ArrayType(FloatType)`.
  *
  * Spark's built-in route for a dot product over array columns is
  * `zip_with` + `aggregate` higher-order functions; measured at 67 s for a
  * 2k x 2k x 64-dim self-join (BASELINE.md q9) because every element hop
  * goes through per-element lambda plumbing. These expressions instead emit
  * a tight scalar loop inside whole-stage codegen, reading floats straight
  * out of `ArrayData`.
  *
  * Numerics: each float is widened to double BEFORE multiplication and
  * accumulation, matching DuckDB's evaluation of `list_cosine_similarity`
  * over a `DOUBLE[]` cast (sequential double accumulation), so oracle
  * comparisons agree bit-for-bit in practice.
  *
  * Lives under `org.apache.spark.sql.graft` because `AbstractDataType` and
  * `ExpressionUtils` are `private[sql]`; the public surface for user code
  * is `graft.functions.VectorFunctions`, which forwards here.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); capability derives
  * from SURVEY.md §2.10 L3/L4 and §4.2.
  */
object VectorKernels {

  /** cosine(a, b) = dot(a,b) / (|a| * |b|); 0.0 when either norm is 0;
    * NULL when the lengths differ (a silent min-length result would let
    * an always-on optimizer rewrite change answers — see
    * CosineNormRewrite; r02 ADVICE). */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    // NULL on length mismatch even with non-null inputs
    override def nullable: Boolean = true
    override def prettyName: String = "cosine_sim"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      if (x.numElements() != y.numElements()) return null
      val n = x.numElements()
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      val denom = math.sqrt(nx) * math.sqrt(ny)
      if (denom == 0.0) 0.0 else dot / denom
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // Every local MUST be ctx.freshName'd: two instances of this
      // expression can be fused into ONE codegen function (e.g. the join
      // condition and the projection), and fixed names then redefine,
      // janino rejects the class, and the whole stage silently falls
      // back to the interpreter (observed in r01 verify logs).
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |if ($a.numElements() != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  int $n = $a.numElements();
        |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    double $x = (double) $a.getFloat($i);
        |    double $y = (double) $b.getFloat($i);
        |    $dot += $x * $y; $nx += $x * $x; $ny += $y * $y;
        |  }
        |  double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
        |  ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
        |}
        """.stripMargin)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** dot(a, b) with double accumulation; NULL when the lengths differ
    * (same contract as [[CosineSimilarity]] so the norm-hoist rewrite
    * stays result-identical). */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "dot_product"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      if (x.numElements() != y.numElements()) return null
      val n = x.numElements()
      var dot = 0.0; var i = 0
      while (i < n) {
        dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
      }
      dot
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |if ($a.numElements() != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  int $n = $a.numElements();
        |  double $dot = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
        |  }
        |  ${ev.value} = $dot;
        |}
        """.stripMargin)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** |a| — Euclidean norm with double accumulation. */
  case class L2Norm(child: Expression)
      extends UnaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "l2_norm"

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var s = 0.0; var i = 0
      while (i < x.numElements()) {
        val xi = x.getFloat(i).toDouble; s += xi * xi; i += 1
      }
      math.sqrt(s)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      nullSafeCodeGen(ctx, ev, a => s"""
        |double $s = 0.0;
        |for (int $i = 0; $i < $a.numElements(); $i++) {
        |  double $x = (double) $a.getFloat($i); $s += $x * $x;
        |}
        |${ev.value} = java.lang.Math.sqrt($s);
        """.stripMargin)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  private def e(c: Column): Expression = ExpressionUtils.expression(c)

  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(e(a), e(b)))

  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(e(a), e(b)))

  def l2Norm(a: Column): Column =
    ExpressionUtils.column(L2Norm(e(a)))
}
