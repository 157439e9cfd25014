package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pure band join — |l.v − r.v| ≤ delta with NO equi key — rewritten as
  * an equi-join on bins so it never plans a broadcast-nested-loop or
  * cartesian product.
  *
  * J9's band join carries an equi key (orderkey) so Catalyst already
  * plans SMJ there; the dangerous case is the band-ONLY predicate, which
  * Spark can only execute as BNLJ/cartesian — O(n·m) pairs at 100 TB.
  * The standard fix (interval/binned range join, cf. the range-join
  * optimization in open-source engines): quantize values into
  * width-`delta` bins, have one side probe its own bin ±1 (any pair
  * within `delta` must land in adjacent bins), equi-join on the bin id,
  * then re-check the exact predicate. Work becomes
  * O(pairs-in-adjacent-bins), shuffle-partitioned by bin — the plan is a
  * plain shuffled equi-join that scales like any other.
  *
  * Skew note: a hot bin (many values in one delta-window) is an AQE
  * skew-join split like any other hot key; for pathological pile-ups,
  * salt the bin id.
  *
  * Reference: /root/reference is empty (SURVEY.md §0.1); contract row
  * SURVEY.md §2.3 J9 (band join — scale path).
  */
object BandJoin {

  /** Left/right must have disjoint column names. Emits all (l, r) rows
    * with |l(lCol) − r(rCol)| ≤ delta.
    */
  def banded(
      left: DataFrame,
      right: DataFrame,
      lCol: String,
      rCol: String,
      delta: Double): DataFrame = {
    require(delta > 0, s"delta must be positive, got $delta")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must be disjoint")
    val lBin = floor(col(lCol) / delta)
    // the probing side explodes to 3 candidate bins; the build side keys
    // by its single home bin, so every qualifying pair matches exactly once.
    val lb = left.withColumn("_gband_bin",
      explode(array(lBin - 1, lBin, lBin + 1)))
    val rb = right.withColumn("_gband_bin", floor(col(rCol) / delta))
    lb.join(rb, "_gband_bin")
      .where(abs(col(lCol) - col(rCol)) <= delta)
      .drop("_gband_bin")
  }
}
