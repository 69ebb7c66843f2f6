package graft.tools

import org.apache.spark.sql.functions._

/** r11-verdict item 4 probe: does `Tables.events`' ts normalization (the
  * NTZ→epoch-ns cast added with the round-11 testdata regeneration) cost
  * a visible per-scan overhead vs the raw parquet read? Both sides
  * project the same columns and run the same honest noop-sink action;
  * the delta is the cast.
  */
object EventsScanBench {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(f: => Unit): Double = { f; (1 to 5).map(_ => time(f)).sorted.apply(2) }
    val raw = med {
      graft.Tables.table(spark, d, "events")
        .select("event_id", "user_id", "event_type", "value")
        .write.format("noop").mode("overwrite").save()
    }
    val normProjected = med {
      graft.Tables.events(spark, d)
        .select("event_id", "user_id", "event_type", "value")
        .write.format("noop").mode("overwrite").save()
    }
    val normWithTs = med {
      graft.Tables.events(spark, d)
        .select("event_id", "user_id", "event_type", "value", "ts", "ts_ms")
        .write.format("noop").mode("overwrite").save()
    }
    val rawWithTs = med {
      graft.Tables.table(spark, d, "events")
        .select("event_id", "user_id", "event_type", "value", "ts")
        .write.format("noop").mode("overwrite").save()
    }
    println(f"EVENTS_SCAN raw=$raw%.3f norm_projected=$normProjected%.3f " +
      f"raw_with_ts=$rawWithTs%.3f norm_with_ts=$normWithTs%.3f s " +
      f"(cast overhead when ts used: ${normWithTs - rawWithTs}%.3f s; " +
      f"when pruned: ${normProjected - raw}%.3f s)")
    spark.stop()
  }
}
