package graft.functions

import scala.collection.mutable

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
  * The buffer is a mutable HashMap mutated in place (kryo-encoded — it
  * only crosses the wire at partial-aggregate boundaries): the common
  * update path is O(1) per row with no per-row map allocation, and the
  * decrement step's O(capacity) sweep amortizes to O(1) per row because
  * every decremented unit was paid for by a prior increment.
  *
  * `finish` emits (key, estimated count) sorted by count desc then key,
  * truncated to `k`.
  */
class HeavyHittersAgg(capacity: Int, k: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[(String, Long)]] {
  require(capacity >= k && k >= 1, s"need capacity >= k >= 1, got $capacity/$k")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(buf: mutable.HashMap[String, Long],
                      x: String): mutable.HashMap[String, Long] = {
    buf.get(x) match {
      case Some(c) => buf.update(x, c + 1)
      case None if buf.size < capacity => buf.update(x, 1L)
      case None =>
        // Misra–Gries decrement step: everyone pays 1, zeros fall out.
        // Snapshot keys first — removing while iterating is undefined.
        val keys = buf.keysIterator.toArray
        var i = 0
        while (i < keys.length) {
          val c = buf(keys(i))
          if (c <= 1L) buf.remove(keys(i)) else buf.update(keys(i), c - 1)
          i += 1
        }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size <= capacity) a
    else {
      // subtract the (capacity+1)-th largest count from everyone, drop <=0
      val cut = a.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val keys = a.keysIterator.toArray
      var i = 0
      while (i < keys.length) {
        val c = a(keys(i)) - cut
        if (c <= 0L) a.remove(keys(i)) else a.update(keys(i), c)
        i += 1
      }
      a
    }
  }

  override def finish(buf: mutable.HashMap[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (key, c) => (-c, key) }.take(k)

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
