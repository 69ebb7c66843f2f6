package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-then-chunk step between a curated corpus
  * and a training run: documents are laid out in a deterministic order
  * (`idCol`), token counts accumulate, and every document is stamped with
  * the fixed-budget training sequence its first token lands in plus its
  * offset inside that sequence (GPT-style packing, where documents may
  * straddle sequence boundaries).
  *
  * The semantics is a GLOBAL running sum — and the naive formulation
  * (`sum().over(Window.orderBy(id))` with no partition spec) is the
  * single-partition window that serializes the whole corpus through one
  * task, the exact anti-pattern the global-percentile op already avoids
  * (ops.Quantiles). The scalable shape here is a two-phase distributed
  * prefix sum:
  *
  *  1. range-partition + sort by `idCol` (each partition owns a disjoint
  *     id range, globally ordered across partitions), materialized ONCE —
  *     the partition-id column must mean the same thing in both phases;
  *  2. per-partition token subtotals — ONE nparts-row aggregate collected
  *     to the driver (bounded by the partition count, like every
  *     dimension-sized collect in this codebase) and prefix-summed;
  *  3. a per-PARTITION window adds the within-partition running sum to
  *     the partition's driver-computed base offset.
  *
  * No task ever sees more than one partition's rows; the only data-sized
  * movements are the range exchange and the per-partition window sort.
  * The output is invariant to the incoming partitioning AND to the range
  * boundaries the exchange's sampler picks (any boundaries yield the same
  * global prefix) — both pinned in PackingSpec.
  */
object Packing {

  /** Stamp each document with (seq_id, seq_offset) under `budget` tokens
    * per training sequence. `tokCol` is any integer token-count column
    * expression; rows are laid out in ascending `idCol` order.
    */
  def packSequences(docs: DataFrame, idCol: String, tokCol: Column,
                    budget: Long): DataFrame =
    packSequencesWithTotal(docs, idCol, tokCol, budget)._1

  /** [[packSequences]] plus the input's TOTAL token count — the number
    * the flows advance their cursor by. The total is the sum of the
    * phase-2 subtotals this pack already collected, so a flow caller
    * saves the separate aggregate job it used to run over the same
    * pinned frame (r17 diet).
    */
  def packSequencesWithTotal(docs: DataFrame, idCol: String, tokCol: Column,
                             budget: Long): (DataFrame, Long) = {
    require(budget > 0, s"budget must be positive, got $budget")
    // materialize the ranged layout once: phases 2 and 3 are separate
    // jobs, and __pid must name the SAME range in both (a re-executed
    // exchange is also a re-run of its boundary sampler). Constraint
    // strip as everywhere (see IvfIndex.ckpt).
    val ranged = org.apache.spark.sql.graftbridge.Bridge.dropCheckpointConstraints(
      docs.select(col(idCol), tokCol.cast("long").as("n_tok"))
        .repartitionByRange(col(idCol))
        .sortWithinPartitions(idCol)
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint())
    // phase 2: nparts-row subtotal table — driver-side prefix (bounded by
    // the partition count, never the corpus). sum() is NULL over a
    // partition whose token counts are ALL NULL (e.g. a cluster of null
    // texts in an adversarial corpus) — such rows contribute 0 tokens.
    val subtotals = ranged.groupBy("__pid")
      .agg(coalesce(sum("n_tok"), lit(0L)).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    if (subtotals.isEmpty)
      return (ranged.select(col(idCol), col("n_tok"),
        lit(0L).as("seq_id"), lit(0L).as("seq_offset")), 0L)
    val bases: Map[Int, Long] = {
      var acc = 0L
      subtotals.map { case (pid, t) => val b = (pid, acc); acc += t; b }.toMap
    }
    // phase 3: within-partition running sum + the partition base. The
    // window partitions on __pid, so no single task ever windows more
    // than one range partition's rows.
    val w = Window.partitionBy("__pid").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val packed = ranged
      .withColumn("__cum_before",
        coalesce(sum("n_tok").over(w), lit(0L)) +
          element_at(typedlit(bases), col("__pid")))
      .select(col(idCol), col("n_tok"),
        expr(s"__cum_before DIV ${budget}L").as("seq_id"),
        pmod(col("__cum_before"), lit(budget)).as("seq_offset"))
    (packed, subtotals.map(_._2).sum)
  }
}
