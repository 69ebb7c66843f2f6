package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-action driver-latency microprobe for the optimization rounds:
  * times N trivial actions of each shape (no-shuffle map job, one tiny
  * shuffle job, localCheckpoint, noop save) on an idle local[32]
  * session — the fixed per-job cost every catalog action pays on this
  * box. `runMain graft.tools.JobLatencyProbe [n]`.
  */
object JobLatencyProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(60)
    val spark = SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", graft.ops.FsUtil.localFsImpl)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    def time(label: String)(work: => Unit): Unit = {
      work // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => work)
      val per = (System.nanoTime() - t0) / 1e6 / n
      println(f"JOBLAT $label%-28s ${per}%8.2f ms/action")
    }
    val df32 = spark.range(0, 3200, 1, 32).toDF("id")
    time("count map-only")(df32.count())
    time("agg one shuffle")(df32.groupBy(pmod(col("id"), lit(7))).count().count())
    time("localCheckpoint 32p") {
      val c = df32.localCheckpoint()
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(c)
    }
    time("noop save map-only")(
      df32.write.format("noop").mode("overwrite").save())
    time("noop save one shuffle")(
      df32.groupBy(pmod(col("id"), lit(7))).count()
        .write.format("noop").mode("overwrite").save())
    time("broadcast join + noop")(
      df32.join(broadcast(spark.range(7).toDF("k")),
          pmod(col("id"), lit(7)) === col("k"))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
