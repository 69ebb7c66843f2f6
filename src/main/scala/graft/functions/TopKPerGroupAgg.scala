package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed `Aggregator` — the map-side scale
  * path for W4 (`q_topk_per_group`'s rank-window formulation). A window
  * `row_number()` must shuffle and SORT every row of every group to rank
  * them; this aggregator keeps only the current best k rows per group in
  * each partition (map-side partial aggregation), so the exchange carries
  * at most k rows per (group, partition) and nothing is ever globally
  * sorted. At 100 TB — billions of orders, top-3 per customer — the
  * window variant's full sort is the bottleneck; this one's shuffle is
  * bounded by k × groups regardless of fact count.
  *
  * Ordering contract (matches the window twin exactly): value DESC, then
  * id ASC on ties — a total order, so the result is deterministic and
  * partitioning-independent (spec-pinned). State is a sorted Vector of
  * ≤ k (value, id) pairs; inserts short-circuit when the candidate sorts
  * at-or-after the current k-th element, so the steady-state per-row cost
  * on a saturated buffer is one comparison. When the incoming row exactly
  * ties the k-th element the skip is still multiset-equivalent to the
  * window twin — the insert-then-take(k) it short-circuits would drop one
  * of the two indistinguishable copies either way — so the equivalence
  * holds for duplicate (value, id) pairs too (PropertySpec drives a
  * tie-storm domain); only which PHYSICAL copy survives is unspecified.
  *
  * The buffer encoder is a struct-array ExpressionEncoder, not Kryo: the
  * agg buffer crosses the partial-aggregation exchange, and an opaque
  * Kryo blob there would defeat columnar layout and inflate shuffle bytes
  * for exactly the operator whose selling point is a small shuffle.
  */
class TopKPerGroupAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  // value DESC, id ASC — the same total order as the window twin's
  // ORDER BY o_totalprice DESC, o_orderkey
  private def ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering[Double].reverse, Ordering[Long])
      .on[(Double, Long)] { case (v, id) => (v, id) }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)],
                      x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length >= k && ord.lteq(buf.last, x)) buf
    else ((buf :+ x).sorted(ord)).take(k)

  override def merge(a: Seq[(Double, Long)],
                     b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
