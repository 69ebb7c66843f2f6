package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

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

  /** Exact GLOBAL percentiles by range-partitioned global ranking — the
    * single-giant-group refinement promised above. No partition ever holds
    * more than ~1/parts of the data:
    *
    *   1. range-partition + sort the value column (`sortBy`: sampled range
    *      bounds, each partition sorts only its slice);
    *   2. count rows per partition (O(parts) to the driver) → cumulative
    *      offsets turn a global rank into (partition, local index);
    *   3. one streaming pass over just the partitions that hold a wanted
    *      rank fetches the straddling values (≤ 2·|ps| rows collected).
    *
    * The two jobs share the sort's shuffle files (Spark skips the
    * already-computed map stage on the second action), so the data is
    * shuffled once and scanned twice — where a single-group window rank
    * would serialize the entire table through ONE sort partition.
    * Interpolation matches Spark's `percentile()` bit-for-bit
    * (QuantilesSpec); DuckDB's `quantile_cont` uses the lerp form
    * `lo + (hi-lo)*frac`, which can differ from the weighted form by 1 ulp,
    * so cross-engine comparisons agree after 4-dp rounding, not bitwise.
    */
  def exactPercentilesGlobal(df: DataFrame, valCol: String, ps: Seq[Double],
                             numParts: Int = 0): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"bad percentiles $ps")
    val spark = df.sparkSession
    val schema = StructType(ps.indices.map(i => StructField(s"p$i", DoubleType)))
    val base = df.select(col(valCol).cast("double").as("v")).filter(col("v").isNotNull)
    val parts = if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val sorted = base.rdd.map(_.getDouble(0))
      .sortBy(identity, ascending = true, numPartitions = parts)
    val partCounts = sorted.mapPartitionsWithIndex { (i, it) =>
      var c = 0L; while (it.hasNext) { it.next(); c += 1 }; Iterator((i, c))
    }.collect().sortBy(_._1).map(_._2)
    val n = partCounts.sum
    if (n == 0)
      return spark.createDataFrame(
        java.util.Collections.emptyList[Row](), schema)
    val offsets = partCounts.scanLeft(0L)(_ + _) // rows before partition i
    val posOf = ps.map(p => 1.0 + p * (n - 1))
    val ranks = posOf.flatMap(pos =>
      Seq(math.floor(pos).toLong, math.ceil(pos).toLong)).distinct
    // rank (1-based) -> (partition, 0-based local index)
    val byPart: Map[Int, Seq[(Long, Long)]] = ranks.map { r =>
      val pi = offsets.lastIndexWhere(_ < r) // offsets(pi) < r <= offsets(pi+1)
      (pi, (r - offsets(pi) - 1, r))
    }.groupBy(_._1).map { case (pi, xs) => (pi, xs.map(_._2)) }
    val bc = spark.sparkContext.broadcast(byPart)
    val fetched: Map[Long, Double] = sorted.mapPartitionsWithIndex { (i, it) =>
      bc.value.get(i) match {
        case None => Iterator.empty
        case Some(want) =>
          val w = want.sortBy(_._1)
          val out = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
          var idx = 0L
          var wi = 0
          while (it.hasNext && wi < w.length) {
            val v = it.next()
            while (wi < w.length && w(wi)._1 == idx) { out += ((w(wi)._2, v)); wi += 1 }
            idx += 1
          }
          out.iterator
      }
    }.collect().toMap
    val row = Row.fromSeq(ps.indices.map { i =>
      val pos = posOf(i)
      val lo = math.floor(pos).toLong
      val hi = math.ceil(pos).toLong
      val vLo = fetched(lo)
      if (hi == lo) vLo
      else vLo * (lo + 1.0 - pos) + fetched(hi) * (pos - lo) // Percentile's form
    })
    spark.createDataFrame(java.util.Arrays.asList(row), schema)
  }
}
