package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-bin histogram aggregation for the summary family
  * (`ops.Sketches`): exact, mergeable (element-wise long add — fully
  * associative, so partial aggregation combines map-side like any
  * algebraic measure), and bounded at `nbins + 2` longs per group
  * regardless of row count. The input is a precomputed bin INDEX
  * (`width_bucket(v, lo, hi, nbins)`: 0 = underflow, nbins+1 =
  * overflow), so the per-row work is one array increment — no per-row
  * allocation, no comparator tree.
  *
  * Quantiles read off the cumulative histogram are exact to one bin
  * width — the declared-error trade every binned-summary store makes
  * (contrast `ops.Quantiles`, which is exact but must see the rows; a
  * histogram column answers p50/p95 from the SUMMARY, never rescanning
  * facts).
  */
final class BinCountAgg(nbins: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(nbins >= 1, s"nbins must be >= 1, got $nbins")

  override def zero: Array[Long] = new Array[Long](nbins + 2)

  override def reduce(buf: Array[Long], idx: Long): Array[Long] = {
    val i = if (idx < 0L) 0 else if (idx > nbins + 1) nbins + 1 else idx.toInt
    buf(i) += 1L
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** Element-wise long-array sum — the MERGE side of histogram columns:
  * re-aggregating per-batch summaries unions their histograms by plain
  * vector addition (`ops.Sketches.merge`). Empty partials (no rows)
  * stay empty and merge as identity.
  */
object VecSumLongAgg
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], v: Array[Long]): Array[Long] = merge(b, v)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) b
    else if (b == null || b.isEmpty) a
    else {
      require(a.length == b.length,
        s"hist merge: ragged partials — ${a.length} vs ${b.length} bins")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
