package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import VectorKernels.{CosineSimilarity, DotProduct, L2Norm}

/** Optimizer rule: hoist per-row L2 norms out of cosine join conditions.
  *
  * A similarity join evaluates its condition once per CANDIDATE PAIR —
  * O(|L|·|R|) times — so `cosine_sim(a, b) > τ` recomputes both vector
  * norms for every pair: three array passes per evaluation. Norms are
  * per-ROW quantities; this rule projects `l2_norm(a)` under the left
  * child and `l2_norm(b)` under the right (O(|L|+|R|) total) and
  * rewrites the condition to one `dot_product` pass per pair:
  *
  *   cosine_sim(a, b)  ⇒  if (size(a) != size(b)) null
  *                        else if (nl·nr = 0) 0.0
  *                        else dot_product(a, b) / (nl·nr)
  *
  * Bit-identical by construction: `L2Norm` computes sqrt of the same
  * double accumulation `CosineSimilarity` uses internally, and the
  * divide/multiply order is unchanged — so oracle-checked results do not
  * move. The size guard matters because the hoisted `L2Norm` spans each
  * FULL array while `CosineSimilarity` returns NULL on mismatched
  * lengths (r02 ADVICE): without it, a zero-norm row paired with a
  * different-length row would flip NULL to 0.0 under the rewrite. A `Project` on top restores the original join schema. At 100 TB
  * this is the difference between 3·n² and n² + 2n array traversals in
  * every brute-force or LSH-bucket verification join.
  *
  * Injected via [[GraftExtensions]] (user-provided optimizer batch, which
  * runs after predicate pushdown has already sunk the similarity filter
  * into the join condition).
  */
object CosineNormRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, _, _, Some(cond), _) if sidedCosines(j, cond).nonEmpty =>
      rewrite(j)
  }

  /** Cosine calls whose arguments each resolve fully against one side. */
  private def sidedCosines(j: Join, cond: Expression): Seq[CosineSimilarity] =
    cond.collect {
      case c @ CosineSimilarity(a, b)
          if sideOf(j, a).isDefined && sideOf(j, b).isDefined => c
    }

  /** Some(true) = expression only needs the left child; Some(false) =
    * only the right; None = straddles both (not rewritable). */
  private def sideOf(j: Join, e: Expression): Option[Boolean] =
    if (e.references.subsetOf(j.left.outputSet)) Some(true)
    else if (e.references.subsetOf(j.right.outputSet)) Some(false)
    else None

  private def rewrite(j: Join): LogicalPlan = {
    val cond = j.condition.get
    // one norm column per distinct vector expression per side
    val leftNorms = mutable.LinkedHashMap.empty[Expression, Alias]
    val rightNorms = mutable.LinkedHashMap.empty[Expression, Alias]
    def normFor(e: Expression): Attribute = {
      val norms = if (sideOf(j, e).get) leftNorms else rightNorms
      norms.getOrElseUpdate(e.canonicalized,
        Alias(L2Norm(e), "_graft_norm")()).toAttribute
    }
    val newCond = cond.transform {
      case c @ CosineSimilarity(a, b)
          if sideOf(j, a).isDefined && sideOf(j, b).isDefined =>
        val denom = Multiply(normFor(a), normFor(b))
        If(Not(EqualTo(Size(a), Size(b))),
          Literal(null, org.apache.spark.sql.types.DoubleType),
          If(EqualTo(denom, Literal(0.0)), Literal(0.0),
            Divide(DotProduct(a, b), denom)))
    }
    val newLeft = Project(j.left.output ++ leftNorms.values, j.left)
    val newRight = Project(j.right.output ++ rightNorms.values, j.right)
    // restore the original schema above the widened join
    Project(j.output, j.copy(left = newLeft, right = newRight,
      condition = Some(newCond)))
  }
}
