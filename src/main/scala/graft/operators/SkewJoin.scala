package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4.3).
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * is the plan-level tool when one key dominates so heavily that even
  * split partitions hot-spot, or when AQE is unavailable (streaming
  * joins). Semantics are identical to the plain equi-join:
  *   - left rows get a deterministic salt in [0, saltFactor) hashed from
  *     a unique column (never random — reruns must agree);
  *   - right rows are replicated once per salt value;
  *   - the join key becomes (key, salt), spreading each hot key over
  *     saltFactor reducers.
  * Cost: right side inflates by saltFactor — use for fact⋈dim shapes
  * where the dim is small relative to the skew pain.
  */
object SkewJoin {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftUniqueCol: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    val l = left.withColumn("_salt",
      pmod(xxhash64(col(leftUniqueCol)), lit(saltFactor)).cast("int"))
    val r = right.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("_salt") === r("_salt"))
      .drop("_salt")
  }
}
