package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra–Gries heavy-hitters summary as a typed `Aggregator` —
  * the frequent-items scale path for corpus curation (top domains, hot
  * tokens, dominant languages) without a full-cardinality groupBy.
  *
  * State is a capped (key → count) map of `capacity` entries. The classic
  * guarantees hold through merges (Agarwal et al., "Mergeable Summaries"):
  * every item with true frequency > n/capacity survives, and each
  * reported count undercounts by at most n/capacity. One map-side
  * combinable pass, O(capacity) state per partition — a 100 TB stream of
  * tokens summarizes in constant memory where exact groupBy-count-sort
  * shuffles the full key cardinality.
  *
  * `finish` emits (key, estimated count) sorted by count desc then key,
  * truncated to `k`.
  */
class HeavyHittersAgg(capacity: Int, k: Int)
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(capacity >= k && k >= 1, s"need capacity >= k >= 1, got $capacity/$k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < capacity => buf.updated(x, 1L)
      case None =>
        // Misra–Gries decrement step: everyone pays 1, zeros fall out
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (key, c)) =>
      m.updated(key, m.getOrElse(key, 0L) + c)
    }
    if (summed.size <= capacity) summed
    else {
      // subtract the (capacity+1)-th largest count from everyone, drop <=0
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      summed.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
