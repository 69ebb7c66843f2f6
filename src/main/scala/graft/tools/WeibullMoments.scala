package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the per-bucket sample moments behind `q_weibull_strength`'s
  * integer verdicts at every local SF, next to the closed-form theory
  * values — the tolerance-calibration evidence for the catalog key (the
  * sampler is keyed and deterministic, so these numbers are facts, not
  * draws; re-run after any sampler or bucketing change).
  */
object WeibullMoments {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shape = 2.0; val scale = 10.0
    val mu = scale * math.sqrt(math.Pi) / 2.0
    val cvT = math.sqrt(4.0 / math.Pi - 1.0)
    println(f"theory: mu=$mu%.4f cv=$cvT%.4f")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val st = graft.pipeline.PostProcess.weibullStrengthKeyed(
        col("p_partkey"), shape, scale, seed = 7L)
      println(sf)
      graft.Tables.part(spark, s"/root/testdata/$sf")
        .select(pmod(col("p_partkey"), lit(4)).cast("long").as("bucket"),
          st.as("strength"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), avg("strength").as("m"),
          stddev_samp("strength").as("sd"), min("strength").as("mn"))
        .orderBy("bucket").collect().foreach { r =>
          println(f"  b=${r.getLong(0)} n=${r.getLong(1)} " +
            f"m=${r.getDouble(2)}%.4f (dev ${(r.getDouble(2) - mu) / mu * 100}%+.1f%%) " +
            f"cv=${r.getDouble(3) / r.getDouble(2)}%.4f mn=${r.getDouble(4)}%.4f")
        }
    }
    spark.stop()
  }
}
