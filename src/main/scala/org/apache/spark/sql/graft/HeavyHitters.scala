package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** X4: custom typed aggregation at scale — approximate heavy hitters via
  * a Misra–Gries summary (capacity-bounded frequency map; any term with
  * true frequency > n/capacity survives; counts under-estimate by at most
  * n/capacity). The buffer merges associatively, so Spark runs it as a
  * normal two-phase aggregate: partial sketches per partition, one merge.
  * This is the pattern for vocabulary/heavy-hitter extraction over
  * corpora too large for an exact explode+groupBy shuffle.
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("min_count", LongType))))
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  private def offer(buf: mutable.HashMap[String, Long], term: String, by: Long): Unit = {
    // Mergeable-summaries MG (Agarwal et al., PODS'12): always credit the
    // incoming term first, then if over capacity subtract the minimum
    // counter (the (capacity+1)-th largest, since we grow by one at a
    // time) from every counter and evict the non-positive ones. Each
    // decrement event destroys ≥ (capacity+1)·dec total weight, so any
    // term's undercount stays ≤ n/(capacity+1) — a heavy term offered
    // with a large weight (e.g. from a partial sketch of clustered
    // input) survives with its residual count instead of being dropped.
    buf.update(term, buf.getOrElse(term, 0L) + by)
    if (buf.size > capacity) {
      var dec = Long.MaxValue
      buf.foreach { case (_, c) => if (c < dec) dec = c }
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (t, c) =>
        if (c <= dec) dead += t else buf.update(t, c - dec)
      }
      dead.foreach(buf.remove)
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.toString, 1L)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => offer(a, t, c) }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
    new GenericArrayData(top.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      buf.update(new String(arr, "UTF-8"), in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HeavyHitters {
  /** Column form: approximate top-k heavy hitters of a string column. */
  def topK(c: Column, capacity: Int = 1024, k: Int = 20): Column =
    ExpressionUtils.column(
      HeavyHitters(ExpressionUtils.expression(c), capacity, k)
        .toAggregateExpression())
}
