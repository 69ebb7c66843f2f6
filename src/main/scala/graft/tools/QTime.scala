package graft.tools
/** One-query bench probe: runMain graft.tools.QTime <name> [sfDir] —
  * steady-state wall (2 warmups + 3 timed) through the Bench noop-sink
  * contract shape (collect). For per-query investigation outside the
  * full Bench sweep.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    (1 to 2).foreach(_ => fn(spark, d).collect())
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, d).collect()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"QTIME $name: ${times.map(t => f"$t%.2f").mkString(" ")} s")
    spark.stop()
  }
}
