package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Map-side bounded top-k per group.
  *
  * The window route for "top k rows per key" (`row_number().over(...)
  * <= k`) shuffles EVERY row to its key's reducer and sorts the full
  * partition — at 100 TB the shuffle is the job. This aggregate keeps a
  * k-bounded min-heap of (score, tie) per group INSIDE the partial
  * aggregation, so each map task ships at most k entries per key and the
  * reducer merges heaps instead of sorting rows. Plans as a two-phase
  * ObjectHashAggregate (partial_top_k_by_score + final), which PlanSpec
  * asserts.
  *
  * Determinism: ranked by (score DESC, tie ASC); `tie` must be unique
  * per group (use the row's primary key) or results are still
  * deterministic but rank assignment among exact (score, tie) duplicates
  * is undefined — same contract as a window ORDER BY with tiebreaker.
  * Output: array<struct<score double, tie bigint>> best-first; recover
  * payload columns by joining back on the tie key (k·groups rows — the
  * cheap side).
  */
case class TopKByScore(
    scoreExpr: Expression,
    tieExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(scoreExpr, tieExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("tie", LongType))))
  override def prettyName: String = "top_k_by_score"

  /** Max-heap by "badness": head is the WORST kept entry (lowest score,
    * then highest tie), the one a better candidate evicts. */
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val t = tieExpr.eval(input)
    if (s != null && t != null) {
      offer(buf, (s.asInstanceOf[Double], t.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(offer(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending by "badness" = best entry first
    val best = buf.toArray.sorted(worstFirst)
    new GenericArrayData(best.map { case (s, t) => InternalRow(s, t) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, t) => out.writeDouble(s); out.writeLong(t) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => offer(buf, (in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), tieExpr = newChildren(1))
}

object TopKByScore {
  /** Column form: top-k (score, tie) pairs per group, score DESC, tie ASC. */
  def topK(score: Column, tie: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByScore(ExpressionUtils.expression(score),
        ExpressionUtils.expression(tie), k).toAggregateExpression())
}
