package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Post-processing analytics over the engine's output series — the
  * downstream half of the reference's workflow (SURVEY §3.3: we reproduce
  * deck I/O + post-processing; the physics kernel is out of scope).
  */
object PostProcess {

  /** D12 — unpivot the wide measured series (`MLSOut00E.dat`: step, time,
    * then 2 measure points × 7 quantities) into the long
    * (step, time, point_idx, metric, value) table. Metric names come from
    * the SysFile registry's measure items (`SysFileIni.Registry
    * .measureItems`), preserving the self-describing-deck property.
    */
  def measuredSeriesLong(series: DataFrame, metricNames: Seq[String],
                         nPoints: Int = 2): DataFrame = {
    val nMetrics = 7
    val entries = for {
      p <- 0 until nPoints
      m <- 0 until nMetrics
    } yield (p, metricNames.lift(m).getOrElse(s"m$m"), s"v${p * nMetrics + m + 1}")
    val stacked = entries.map { case (p, name, colName) =>
      struct(lit(p).as("point_idx"), lit(name).as("metric"),
        col(colName).as("value"))
    }
    series.select(col("step"), col("time"),
        explode(array(stacked: _*)).as("e"))
      .select(col("step"), col("time"), col("e.point_idx"),
        col("e.metric"), col("e.value"))
  }

  /** W2 verification — the committed decks drive the top platen at a
    * constant velocity, so its displacement column must satisfy
    * u(t) = v·t exactly (verified against
    * `BrazilSplitTest/Output/MLSOut00E.dat` in SURVEY D12). Returns rows
    * violating the law beyond `tol` — an engine-output consistency check.
    */
  def displacementLawViolations(seriesLong: DataFrame, metric: String,
                                pointIdx: Int, velocity: Double,
                                tol: Double = 1e-6): DataFrame =
    seriesLong
      .filter(col("metric") === metric && col("point_idx") === pointIdx)
      .withColumn("expected", lit(velocity) * col("time"))
      .filter(abs(col("value") - col("expected")) > tol)

  /** W3 — per-particle deltas between consecutive snapshots (damage /
    * evolution between frames 250 steps apart).
    */
  def snapshotDeltas(snapshots: DataFrame): DataFrame = {
    val w = Window.partitionBy("particle_id").orderBy("step")
    snapshots.select(col("step"), col("particle_id"),
      (col("ux") - lag("ux", 1).over(w)).as("dux"),
      (col("uy") - lag("uy", 1).over(w)).as("duy"),
      (col("uz") - lag("uz", 1).over(w)).as("duz"))
  }

  /** A6 hook — the reference ships a (disabled) Weibull strength
    * heterogeneity input (`Webull.dat:1` = 0). Seeded inverse-CDF Weibull
    * sampling: x = scale · (-ln(1-u))^(1/shape); deterministic under the
    * seed, pure column arithmetic.
    */
  def weibullStrength(df: DataFrame, shape: Double, scale: Double,
                      seed: Long, out: String = "strength"): DataFrame =
    df.withColumn(out,
      lit(scale) * pow(-log(lit(1.0) - rand(seed)), lit(1.0 / shape)))

  /** Catalog-grade variant of [[weibullStrength]]: the uniform comes from
    * a 20-bit slice of `xxhash64(key, seed)` instead of `rand(seed)`, so
    * the assignment is a pure function of the KEY — identical under any
    * partitioning, task retry, or cluster size (rand(seed)'s sequence is
    * per-partition, which is fine for the seeded-mesh pipeline but wrong
    * for a replayable per-particle strength table). The slice is centered
    * (`(h + 0.5) / 2^20`) so u ∈ (0,1) strictly and the inverse CDF
    * x = scale·(-ln(1-u))^(1/shape) is strictly positive and finite.
    * Pure codegen column arithmetic — zero shuffle at any scale.
    */
  def weibullStrengthKeyed(key: Column, shape: Double, scale: Double,
                           seed: Long): Column = {
    val bits = 1 << 20
    val u = (pmod(xxhash64(key, lit(seed)), lit(bits)).cast("double") +
      lit(0.5)) / lit(bits.toDouble)
    lit(scale) * pow(-log(lit(1.0) - u), lit(1.0 / shape))
  }
}
