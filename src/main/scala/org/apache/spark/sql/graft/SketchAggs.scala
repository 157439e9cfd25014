package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union, UpdateSketch}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** DataSketches-backed mergeable-summary aggregates beyond the
  * `hll_sketch_agg` family Spark ships (x32): KLL quantile sketches
  * and theta set sketches as X4-class `TypedImperativeAggregate`s.
  *
  * Both are the textbook at-scale summary shape: fixed-size buffers,
  * associative merges — the partial-agg tree ships kilobytes per
  * group per task no matter how many rows flow through. KLL answers
  * "what is the p50/p99" with a proven rank-error bound; theta
  * answers what HLL structurally cannot — SET ALGEBRA over distincts
  * (|A ∩ B| needs retained hash samples, not just cardinality
  * registers).
  *
  * Library references: Karnin/Lang/Liberty, "Optimal Quantile
  * Approximation in Streams" (KLL, FOCS 2016); the theta sketch
  * framework per the Apache DataSketches documentation.
  */
object SketchAggs {

  /** Column form: array of KLL quantile estimates (INCLUSIVE search)
    * of `value` at the given ranks, sketched with parameter `k`
    * (~1.65% rank error at k=200). */
  def kllQuantiles(value: Column, k: Int, ranks: Seq[Double]): Column =
    ExpressionUtils.column(
      KllQuantilesAgg(ExpressionUtils.expression(value), k, ranks)
        .toAggregateExpression())

  /** Column form: compact theta sketch bytes of `value`'s distinct set
    * at log-nominal-entries `lgK` (4096 retained hashes at 12). */
  def thetaSketch(value: Column, lgK: Int): Column =
    ExpressionUtils.column(
      ThetaSketchAgg(ExpressionUtils.expression(value), lgK)
        .toAggregateExpression())

  /** Distinct-cardinality estimate of a compact theta sketch. */
  def thetaEstimate(bytes: Array[Byte]): Double =
    Sketches.heapifyCompactSketch(Memory.wrap(bytes)).getEstimate

  /** |A ∩ B| estimate from two compact theta sketches. */
  def thetaIntersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val inter = SetOperation.builder().buildIntersection()
    inter.intersect(Sketches.heapifyCompactSketch(Memory.wrap(a)))
    inter.intersect(Sketches.heapifyCompactSketch(Memory.wrap(b)))
    inter.getResult.getEstimate
  }

  /** |A ∖ B| estimate (set difference) from two compact sketches. */
  def thetaDifferenceEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val diff = SetOperation.builder().buildANotB()
    diff.aNotB(
      Sketches.heapifyCompactSketch(Memory.wrap(a)),
      Sketches.heapifyCompactSketch(Memory.wrap(b))).getEstimate
  }

  /** |A ∪ B| estimate from two compact sketches (theta union — the
    * merge the aggregate itself uses, exposed pairwise). */
  def thetaUnionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val u: Union = SetOperation.builder().buildUnion()
    u.union(Sketches.heapifyCompactSketch(Memory.wrap(a)))
    u.union(Sketches.heapifyCompactSketch(Memory.wrap(b)))
    u.getResult.getEstimate
  }

  /** Jaccard similarity estimate |A ∩ B| / |A ∪ B| from the two
    * compact sketches alone (SURVEY §18.16 thread 3). Both operands
    * derive from the SAME retained-hash samples, so the ratio's
    * errors are correlated and it is tighter in practice than the
    * two ±ε cardinalities would suggest; 0/0 (two empty sets) is
    * defined as 1.0, the set-identity convention. */
  def thetaJaccardEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val union = thetaUnionEstimate(a, b)
    if (union == 0.0) 1.0 else thetaIntersectEstimate(a, b) / union
  }
}

/** KLL doubles quantile sketch aggregate: buffer = the heap sketch,
  * merge = KLL's native merge, eval = quantile readouts at the fixed
  * ranks (INCLUSIVE criteria — the deterministic convention). Empty
  * input evals to an empty array rather than throwing. */
case class KllQuantilesAgg(
    child: Expression,
    k: Int,
    ranks: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ImplicitCastInputTypes {

  require(k >= 8, "KLL k must be >= 8")
  require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
    "ranks must be within [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType)
  override def prettyName: String = "kll_quantiles"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b)
    a
  }

  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) new GenericArrayData(Array.empty[Double])
    else new GenericArrayData(
      buf.getQuantiles(ranks.toArray, QuantileSearchCriteria.INCLUSIVE))

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Theta set sketch aggregate over LONG keys: buffer = a theta Union
  * (accepts raw updates and merged sketches uniformly), eval = the
  * compact immutable sketch bytes — feed them to
  * [[SketchAggs.thetaEstimate]] / `thetaIntersectEstimate` /
  * `thetaDifferenceEstimate` for the set algebra. */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaBuffer]
  with ImplicitCastInputTypes {

  require(lgK >= 4 && lgK <= 26, "theta lgK must be in [4, 26]")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch"

  override def createAggregationBuffer(): ThetaBuffer =
    new ThetaBuffer(lgK)

  override def update(buf: ThetaBuffer, input: InternalRow): ThetaBuffer = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: ThetaBuffer, b: ThetaBuffer): ThetaBuffer = {
    a.mergeFrom(b)
    a
  }

  override def eval(buf: ThetaBuffer): Any = buf.compactBytes()

  override def serialize(buf: ThetaBuffer): Array[Byte] = buf.compactBytes()

  override def deserialize(bytes: Array[Byte]): ThetaBuffer = {
    val buf = new ThetaBuffer(lgK)
    buf.absorbCompact(bytes)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** Mutable theta buffer: raw updates land in an UpdateSketch; merged
  * partials fold through a Union. Kept tiny and JVM-local — the
  * aggregate serializes it as the compact form. */
final class ThetaBuffer(lgK: Int) {
  private val updater: UpdateSketch =
    UpdateSketch.builder().setLogNominalEntries(lgK).build()
  private var union: Union = _

  def update(v: Long): Unit = updater.update(v)

  private def ensureUnion(): Union = {
    if (union == null) union = SetOperation.builder()
      .setLogNominalEntries(lgK).buildUnion()
    union
  }

  def absorbCompact(bytes: Array[Byte]): Unit =
    ensureUnion().union(Sketches.heapifyCompactSketch(Memory.wrap(bytes)))

  def mergeFrom(other: ThetaBuffer): Unit = {
    val u = ensureUnion()
    u.union(other.updater.compact())
    if (other.union != null) u.union(other.union.getResult)
  }

  def compactBytes(): Array[Byte] = {
    val result: CompactSketch =
      if (union == null) updater.compact()
      else {
        union.union(updater.compact(): Sketch)
        union.getResult
      }
    result.toByteArray
  }
}
