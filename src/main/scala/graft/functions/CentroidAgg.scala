package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** §2.10 typed-aggregator surface: 2-D centroid as an
  * `Aggregator[IN, BUF, OUT]` (the reference's polygon-centroid / Lloyd
  * step, `GenerateColumnar.py:107,195`). Register with
  * `spark.udf.register("centroid2d", udaf(CentroidAgg))` and use from SQL
  * or the DataFrame API; partial aggregation (merge) keeps it map-side
  * combinable like any built-in agg.
  */
object CentroidAgg extends Aggregator[(Double, Double), (Double, Double, Long), (Double, Double)] {
  override def zero: (Double, Double, Long) = (0.0, 0.0, 0L)
  override def reduce(b: (Double, Double, Long), p: (Double, Double)): (Double, Double, Long) =
    (b._1 + p._1, b._2 + p._2, b._3 + 1)
  override def merge(a: (Double, Double, Long), b: (Double, Double, Long)): (Double, Double, Long) =
    (a._1 + b._1, a._2 + b._2, a._3 + b._3)
  override def finish(r: (Double, Double, Long)): (Double, Double) =
    if (r._3 == 0) (Double.NaN, Double.NaN) else (r._1 / r._3, r._2 / r._3)
  override def bufferEncoder: Encoder[(Double, Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
}
