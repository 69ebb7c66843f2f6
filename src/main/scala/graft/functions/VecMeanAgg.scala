package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Partial-aggregation buffer for [[VecMeanAgg]]: element-wise double sum +
  * member count. `sum` is allocated lazily on the first vector so the
  * aggregator needs no up-front dimension parameter.
  */
final case class VecSumBuf(sum: Array[Double], n: Long)

/** §2.10 typed-aggregator surface, vector edition: element-wise mean of a
  * float-array column — the k-means centroid update (the vector analogue of
  * [[CentroidAgg]], which is the reference's 2-D polygon-centroid step,
  * `GenerateColumnar.py:107,195`).
  *
  * Being an `Aggregator` makes it an ImperativeAggregate with partial merge:
  * the map side combines every partition down to one `dim`-length double sum
  * per group BEFORE the shuffle, so a Lloyd centroid update over any corpus
  * size moves only `nlist × dim` doubles per map partition through a single
  * Exchange — versus `posexplode`'s corpus×dim rows through two. Sums are
  * accumulated in double for precision; the finish casts back to float to
  * match the embedding column type.
  */
object VecMeanAgg extends Aggregator[Array[Float], VecSumBuf, Array[Float]] {

  override def zero: VecSumBuf = VecSumBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecSumBuf, v: Array[Float]): VecSumBuf = {
    if (v == null) b
    else if (b.n == 0L) {
      val s = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { s(i) = v(i); i += 1 }
      VecSumBuf(s, 1L)
    } else {
      require(b.sum.length == v.length,
        s"vec_mean: ragged input — ${b.sum.length} vs ${v.length} dims")
      var i = 0
      while (i < v.length) { b.sum(i) += v(i); i += 1 }
      VecSumBuf(b.sum, b.n + 1L)
    }
  }

  override def merge(a: VecSumBuf, b: VecSumBuf): VecSumBuf = {
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      require(a.sum.length == b.sum.length,
        s"vec_mean: ragged partials — ${a.sum.length} vs ${b.sum.length} dims")
      var i = 0
      while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
      VecSumBuf(a.sum, a.n + b.n)
    }
  }

  override def finish(r: VecSumBuf): Array[Float] =
    if (r.n == 0L) Array.emptyFloatArray
    else {
      val out = new Array[Float](r.sum.length)
      var i = 0
      while (i < out.length) { out(i) = (r.sum(i) / r.n).toFloat; i += 1 }
      out
    }

  override def bufferEncoder: Encoder[VecSumBuf] = Encoders.product[VecSumBuf]
  override def outputEncoder: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()
}
