package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Sequence packing for training-data assembly: group documents into
  * fixed-capacity context windows (bins of ≤ `capacity` tokens) with as
  * little padding waste as possible.
  *
  * Algorithm: first-fit-decreasing WITHIN each partition — repartition by
  * id hash, sort each partition by token count descending, then stream
  * rows through an open-bins list. FFD's quality guarantee survives
  * partitioning: within a partition, at most ONE bin can end up under
  * half capacity (if two were, the later bin's first item — smaller than
  * half — would have fit in the earlier one), so utilization stays ≥ ~50%
  * worst-case and is far better in practice.
  *
  * Scale posture: one shuffle (the repartition), then per-partition
  * streaming state of O(open bins) — no global coordination, no driver
  * collection; bin ids are made globally unique by offsetting with the
  * partition id. This is the mapPartitions-as-last-resort case the
  * architecture doc carves out: per-partition imperative packing state
  * has no declarative equivalent.
  *
  * Documents longer than `capacity` get a singleton bin (downstream
  * chunking's problem — flagged by `oversize`), so no row is dropped.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); pipeline-ops
  * family, SURVEY.md §2.10.
  */
object Packing {

  /** @return (id, n_tokens, part_id, bin_id, oversize) — bin_id globally
    *         unique; every input row appears exactly once.
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      tokCol: String,
      capacity: Int,
      numPartitions: Int = 32): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = docs.sparkSession
    val in = docs.select(col(idCol).cast("long").as("id"),
      col(tokCol).cast("int").as("n_tokens"))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("part_id", IntegerType, nullable = false),
      StructField("bin_id", LongType, nullable = false),
      StructField("oversize", BooleanType, nullable = false)))
    val packed = in
      .repartition(numPartitions, col("id"))
      .sortWithinPartitions(col("n_tokens").desc, col("id").asc)
      .mapPartitions { it =>
        val part = TaskContext.getPartitionId()
        // (binIdx, remaining) — first-fit over open bins
        val bins = ArrayBuffer.empty[Int]
        it.map { r =>
          val id = r.getLong(0)
          val tok = r.getInt(1)
          val oversize = tok > capacity
          val binIdx =
            if (oversize) { bins += -1; bins.length - 1 } // closed singleton
            else {
              val i = bins.indexWhere(_ >= tok)
              if (i >= 0) { bins(i) -= tok; i }
              else { bins += (capacity - tok); bins.length - 1 }
            }
          Row(id, tok, part, part.toLong * 1000000L + binIdx, oversize)
        }
      }(org.apache.spark.sql.Encoders.row(schema))
    packed
  }
}
