package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Partial-aggregation buffer for [[VecMinMaxAgg]]: element-wise running
  * min and max. Allocated lazily on the first vector, like [[VecSumBuf]].
  */
final case class VecMinMaxBuf(mins: Array[Float], maxs: Array[Float], n: Long)

/** Element-wise [min, max] of a float-array column — the corpus statistics
  * pass that fits a scalar quantizer ([[graft.ops.Quantize]]): the affine
  * int8 code range per dimension is exactly this envelope.
  *
  * Same partial-merge discipline as [[VecMeanAgg]]: the map side folds every
  * partition to one 2×dim buffer BEFORE the shuffle, so fitting the
  * quantizer over any corpus size moves only `2 × dim` floats per map
  * partition through a single Exchange. Finish returns `[mins, maxs]` as a
  * 2-element array of dim-length arrays.
  */
object VecMinMaxAgg
    extends Aggregator[Array[Float], VecMinMaxBuf, Array[Array[Float]]] {

  override def zero: VecMinMaxBuf =
    VecMinMaxBuf(Array.emptyFloatArray, Array.emptyFloatArray, 0L)

  override def reduce(b: VecMinMaxBuf, v: Array[Float]): VecMinMaxBuf = {
    if (v == null) b
    else if (b.n == 0L) {
      VecMinMaxBuf(v.clone(), v.clone(), 1L)
    } else {
      require(b.mins.length == v.length,
        s"vec_minmax: ragged input — ${b.mins.length} vs ${v.length} dims")
      var i = 0
      while (i < v.length) {
        if (v(i) < b.mins(i)) b.mins(i) = v(i)
        if (v(i) > b.maxs(i)) b.maxs(i) = v(i)
        i += 1
      }
      VecMinMaxBuf(b.mins, b.maxs, b.n + 1L)
    }
  }

  override def merge(a: VecMinMaxBuf, b: VecMinMaxBuf): VecMinMaxBuf = {
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      require(a.mins.length == b.mins.length,
        s"vec_minmax: ragged partials — ${a.mins.length} vs ${b.mins.length} dims")
      var i = 0
      while (i < a.mins.length) {
        if (b.mins(i) < a.mins(i)) a.mins(i) = b.mins(i)
        if (b.maxs(i) > a.maxs(i)) a.maxs(i) = b.maxs(i)
        i += 1
      }
      VecMinMaxBuf(a.mins, a.maxs, a.n + b.n)
    }
  }

  override def finish(r: VecMinMaxBuf): Array[Array[Float]] =
    Array(r.mins, r.maxs)

  override def bufferEncoder: Encoder[VecMinMaxBuf] =
    Encoders.product[VecMinMaxBuf]
  override def outputEncoder: Encoder[Array[Array[Float]]] =
    ExpressionEncoder[Array[Array[Float]]]()
}
