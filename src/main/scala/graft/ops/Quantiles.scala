package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed percentiles without per-group value buffering.
  *
  * Spark's exact `percentile` aggregate holds EVERY value of a group in
  * the agg buffer — fine at test scale, a memory wall at 100 TB group
  * sizes. This operator gets the same interpolated answer from a
  * sort-based rank join instead:
  *
  *   1. rank values per group (one range-partitioned window sort);
  *   2. compute each percentile's fractional position 1 + p·(n−1) from
  *      the group counts (tiny frame);
  *   3. equi-join the two straddling ranks per (group, percentile) and
  *      interpolate with Spark's weighted two-point form.
  *
  * Memory: the window sort SPILLS (ExternalSorter), so a huge group
  * degrades to disk-backed sorting where `percentile()`'s in-memory
  * value buffer simply OOMs. One caveat remains at extreme scale: a
  * single group still serializes through one sort partition — if one
  * group alone exceeds a node's disk, the next refinement is
  * range-partitioned global ranking (sort by (g, v), compute per-group
  * rank offsets from partition boundaries). Interpolation matches
  * `percentile()` / DuckDB `quantile_cont` bit-for-bit (spec'd).
  */
object Quantiles {

  /** One row per group: the requested percentiles as columns `p<i>`,
    * ordered as given. Values are computed in double.
    */
  def exactPercentiles(df: DataFrame, groupCol: String, valCol: String,
                       ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"bad percentiles $ps")
    val base = df.select(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val ranked = base.withColumn("rn",
      row_number().over(Window.partitionBy("g").orderBy("v")))
    val counts = base.groupBy("g").agg(count(lit(1)).as("n"))
    val targets = counts.select(col("g"),
      explode(array(ps.zipWithIndex.map { case (p, i) =>
        struct(lit(i).as("pi"),
          (lit(1.0) + lit(p) * (col("n") - 1).cast("double")).as("pos"))
      }: _*)).as("t"))
      .select(col("g"), col("t.pi"), col("t.pos"),
        floor(col("t.pos")).cast("long").as("lo"),
        ceil(col("t.pos")).cast("long").as("hi"))
    // straddling ranks, fetched via an EQUI join on (g, rank)
    val wanted = targets.select(col("g"), col("pi"), col("pos"), col("lo"),
      explode(array(col("lo"), col("hi"))).as("rn"))
    val vals = wanted.join(ranked, Seq("g", "rn"))
      .groupBy(col("g"), col("pi"), col("pos"), col("lo"))
      .agg(min(when(col("rn") === col("lo"), col("v"))).as("v_lo"),
        min(when(col("rn") =!= col("lo"), col("v"))).as("v_hi"))
      .select(col("g"), col("pi"),
        // Spark's Percentile uses the weighted two-point form, not
        // lower + diff·frac — match it bit-for-bit
        when(col("v_hi").isNull, col("v_lo")).otherwise(
          col("v_lo") * (col("lo").cast("double") + 1.0 - col("pos")) +
            col("v_hi") * (col("pos") - col("lo").cast("double"))).as("q"))
    // pivot the fixed, caller-ordered percentile index into columns
    val aggs = ps.indices.map(i =>
      min(when(col("pi") === i, col("q"))).as(s"p$i"))
    vals.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
  }
}
