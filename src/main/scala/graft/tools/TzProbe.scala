package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

object TzProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(0L, 1500000L, 86400L * 1000000L, 86400L * 1000000L + 1L,
        -1L, 1755080000123456L).toDF("us")
      .withColumn("ntz", timestamp_micros(col("us")).cast(TimestampNTZType))
    val wallUs =
      unix_date(col("ntz").cast("date")) * lit(86400000000L) +
      hour(col("ntz")) * lit(3600000000L) +
      minute(col("ntz")) * lit(60000000L) +
      (expr("date_part('SECOND', ntz)") * lit(1000000)).cast("long")
    Seq("UTC", "America/New_York", "Asia/Tokyo").foreach { tz =>
      spark.conf.set("spark.sql.session.timeZone", tz)
      println(tz)
      df.select(col("us"), wallUs.as("wall")).collect()
        .foreach(x => println(s"  ${x.getLong(0)} | ${x.getLong(1)} | ${if (x.getLong(0) == x.getLong(1)) "OK" else "MISMATCH"}"))
    }
    spark.stop()
  }
}
