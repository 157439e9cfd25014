package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** X2: typed UDAF surface demo — geometric mean via `Aggregator`.
  * Partial aggregation works the usual two-phase way (reduce per
  * partition, merge across), so it scales like any built-in agg.
  * Oracle equivalent: exp(avg(ln(x))).
  */
case class GeoMeanBuffer(var sumLn: Double, var n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuffer, Double] {
  override def zero: GeoMeanBuffer = GeoMeanBuffer(0.0, 0L)
  override def reduce(b: GeoMeanBuffer, x: Double): GeoMeanBuffer = {
    b.sumLn += math.log(x); b.n += 1; b
  }
  override def merge(a: GeoMeanBuffer, b: GeoMeanBuffer): GeoMeanBuffer = {
    a.sumLn += b.sumLn; a.n += b.n; a
  }
  override def finish(b: GeoMeanBuffer): Double =
    if (b.n == 0) Double.NaN else math.exp(b.sumLn / b.n)
  override def bufferEncoder: Encoder[GeoMeanBuffer] = Encoders.product
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form, usable in `agg`. */
  def column(c: Column): Column = udaf(GeoMean).apply(c)
}
