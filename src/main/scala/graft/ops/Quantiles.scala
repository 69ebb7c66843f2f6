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
  * The grouped default (`exactPercentiles`) is RANGE-PARTITIONED: sort by
  * (g, v) with sampled range bounds — a giant group spans many partitions
  * because v participates in the range key — then turn per-partition
  * (group, count) run-lengths (O(parts + groups) to the driver, since a
  * group's rows are contiguous across at most adjacent partitions) into
  * global per-group rank offsets, and fetch only the ≤ 2·|ps| straddling
  * ranks per group in a second pass that reuses the sort's shuffle files.
  * No partition ever holds more than ~n/parts rows, where the old
  * window-rank form serialized each whole group through ONE sort
  * partition (parallelism capped at the group count — the 100 TB
  * scale-killer for 3-flag groupings).
  *
  * Routing: the ranked route collects the per-group count table and the
  * fetched straddle values (≤ 2·|ps|·groups rows) to the driver, so it is
  * the right shape exactly when groups are FEW and rows are MANY. Above
  * `maxRankedGroups` distinct groups the windowed form is used instead —
  * at that cardinality its parallelism (min(groups, parts)) is no longer
  * the bottleneck and nothing is collected. The windowed twin stays
  * public as the oracle cross-check (QuantilesSpec proves equality).
  *
  * Interpolation matches `percentile()` / DuckDB `quantile_cont`
  * bit-for-bit (spec'd).
  */
object Quantiles {

  /** Above this many distinct groups, `exactPercentiles` uses the
    * windowed form (enough parallelism; avoids a groups-sized driver
    * collect). Matches the SURVEY §7.3 bounded-collect convention.
    */
  val maxRankedGroups = 10000

  /** Canonicalize a collected group key the way Spark's groupBy does:
    * -0.0 folds into 0.0 (double and float). Raw sorted rows keep the
    * sign bit, so every driver-side map keyed by group must go through
    * this or a -0.0 row misses its 0.0 group entry. (NaN needs no help:
    * boxed Double.equals treats all NaNs as equal, matching grouping.)
    */
  private def normKey(x: Any): Any = x match {
    case d: java.lang.Double if d.doubleValue() == 0.0 => java.lang.Double.valueOf(0.0)
    case f: java.lang.Float if f.floatValue() == 0.0f => java.lang.Float.valueOf(0.0f)
    case other => other
  }

  /** One row per group: the requested percentiles as columns `p<i>`,
    * ordered as given. Values are computed in double. Routes between the
    * range-partitioned ranked form (few groups) and the windowed form
    * (many groups) — see the object scaladoc.
    */
  def exactPercentiles(df: DataFrame, groupCol: String, valCol: String,
                       ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), s"bad percentiles $ps")
    val base = df.select(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    // routing probe: one bounded-collect aggregation. When it overflows,
    // the windowed route recomputes its own counts — a second aggregation
    // scan, accepted deliberately: it only hits the >maxRankedGroups path,
    // where the windowed form's full per-group sort dwarfs one hash agg,
    // and the alternative (an approx-distinct pre-probe) would tax the
    // few-group hot path with an extra scan instead (r12 review note).
    val counts = base.groupBy("g").agg(count(lit(1)).as("n"))
      .limit(maxRankedGroups + 1).collect()
    if (counts.length > maxRankedGroups)
      exactPercentilesWindowed(df, groupCol, valCol, ps)
    else
      rankedGrouped(base, counts.map(r => (normKey(r.get(0)), r.getLong(1))), ps)
  }

  /** The windowed (row_number-per-group) form — kept as the oracle twin
    * for the ranked route. Correct at any group cardinality but each
    * group sorts through a single partition.
    */
  def exactPercentilesWindowed(df: DataFrame, groupCol: String, valCol: String,
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

  /** Range-partitioned grouped ranking (the grouped twin of
    * `exactPercentilesGlobal`). `base` has columns (g, v: double, non-null
    * v); `groupCounts` is the already-collected per-group row count
    * (≤ maxRankedGroups entries).
    *
    *   1. repartitionByRange + sortWithinPartitions on (g, v): sampled
    *      bounds, and because v is part of the range key a single giant
    *      group SPLITS across partitions — per-partition rows ≈ n/parts,
    *      never n/groups;
    *   2. one pass emits per-partition (group, run-length) — groups are
    *      contiguous within a partition and across the partition order, so
    *      this is O(parts + groups) rows to the driver;
    *   3. driver turns group totals into fractional positions
    *      1 + p·(n_g−1), maps each straddling rank to (partition, local
    *      index within that partition's slice of the group);
    *   4. a second pass over only the partitions that hold a wanted rank
    *      streams to those indices (≤ 2·|ps|·groups rows collected). The
    *      second job reuses the sort's shuffle files (same RDD lineage,
    *      map stage skipped), so the data shuffles once, scans twice.
    */
  private def rankedGrouped(base: DataFrame, groupCounts: Array[(Any, Long)],
                            ps: Seq[Double]): DataFrame = {
    val spark = base.sparkSession
    val gField = base.schema.head
    val schema = StructType(gField +:
      ps.indices.map(i => StructField(s"p$i", DoubleType)))
    if (groupCounts.isEmpty)
      return spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)
    val sorted = base
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions,
        col("g"), col("v"))
      .sortWithinPartitions("g", "v")
    val rdd = sorted.rdd
    // (partition, group, run-length), partition-major then run order.
    // Group keys are normalized (normKey): Spark's groupBy folds -0.0 and
    // 0.0 (and NaN bit patterns) into ONE group, but the raw sorted rows
    // keep their original values — run detection on raw doubles would
    // split that group into runs keyed by values groupCounts doesn't
    // contain (r12 review).
    val runs: Array[(Int, Any, Long)] = rdd.mapPartitionsWithIndex { (pi, it) =>
      val out = scala.collection.mutable.ArrayBuffer[(Int, Any, Long)]()
      var cur: Any = null
      var started = false
      var c = 0L
      while (it.hasNext) {
        val g = normKey(it.next().get(0))
        if (!started || g != cur) {
          if (started) out += ((pi, cur, c))
          cur = g; c = 1L; started = true
        } else c += 1L
      }
      if (started) out += ((pi, cur, c))
      out.iterator
    }.collect().sortBy(_._1)
    // per group: rows of that group BEFORE partition pi (partition order is
    // global (g, v) order, so a group's runs are consecutive partitions)
    val offsetOf = scala.collection.mutable.Map[(Any, Int), Long]()
    val seenOf = scala.collection.mutable.Map[Any, Long]()
    runs.foreach { case (pi, g, c) =>
      val seen = seenOf.getOrElse(g, 0L)
      offsetOf((g, pi)) = seen
      seenOf(g) = seen + c
    }
    // straddling ranks per group -> (partition, local idx within the
    // group's slice of that partition)
    val posOf: Map[Any, Seq[Double]] = groupCounts.map { case (g, n) =>
      g -> ps.map(p => 1.0 + p * (n - 1)).toSeq
    }.toMap
    val wantRanks: Seq[(Any, Long)] = groupCounts.toSeq.flatMap { case (g, _) =>
      posOf(g).flatMap(pos =>
        Seq(math.floor(pos).toLong, math.ceil(pos).toLong)).distinct.map((g, _))
    }
    val runsByGroup = runs.groupBy(_._2)
    val byPart: Map[Int, Seq[(Any, Long, Long)]] = wantRanks.map { case (g, r) =>
      // the run where this rank lands: offset < r <= offset + run count
      val (pi, _, _) = runsByGroup(g)
        .find { case (pi2, _, c) => offsetOf((g, pi2)) < r &&
          r <= offsetOf((g, pi2)) + c }.get
      (pi, (g, r - offsetOf((g, pi)) - 1, r)) // 0-based local idx in slice
    }.groupBy(_._1).map { case (pi, xs) => (pi, xs.map(_._2)) }
    val bc = spark.sparkContext.broadcast(byPart)
    val fetched: Map[(Any, Long), Double] = rdd.mapPartitionsWithIndex { (pi, it) =>
      bc.value.get(pi) match {
        case None => Iterator.empty
        case Some(wants) =>
          val byG: Map[Any, Array[(Long, Long)]] = wants.groupBy(_._1)
            .map { case (g, xs) =>
              (g, xs.map(t => (t._2, t._3)).sortBy(_._1).toArray)
            }
          // cursor walk, same as exactPercentilesGlobal's bounded pass:
          // groups are contiguous within the partition, so one
          // (array, cursor) per current group suffices, and the task
          // stops as soon as every wanted rank is served instead of
          // streaming the rest of the partition (r12 review)
          val out = scala.collection.mutable.ArrayBuffer[((Any, Long), Double)]()
          var remaining = wants.size
          var cur: Any = null
          var started = false
          var idx = 0L // index within the current group's slice
          var arr: Array[(Long, Long)] = Array.empty
          var wi = 0
          while (it.hasNext && remaining > 0) {
            val row = it.next()
            val g = normKey(row.get(0))
            if (!started || g != cur) {
              cur = g; idx = 0L; started = true
              arr = byG.getOrElse(g, Array.empty); wi = 0
            }
            while (wi < arr.length && arr(wi)._1 == idx) {
              out += (((cur, arr(wi)._2), row.getDouble(1)))
              wi += 1; remaining -= 1
            }
            idx += 1L
          }
          out.iterator
      }
    }.collect().toMap
    val rows: Seq[Row] = groupCounts.toSeq.map { case (g, _) =>
      Row.fromSeq(g +: posOf(g).map { pos =>
        val lo = math.floor(pos).toLong
        val hi = math.ceil(pos).toLong
        val vLo = fetched((g, lo))
        if (hi == lo) vLo
        else vLo * (lo + 1.0 - pos) + fetched((g, hi)) * (pos - lo)
      })
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }
}
