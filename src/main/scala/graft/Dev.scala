package graft
import org.apache.spark.sql.SparkSession

/** Scratch probe main — not part of the library surface. */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = SparkEntry.entry(spark)
    println("ENTRY ROWS = " + e.count())
    e.show(10, truncate = false)
    spark.stop()
  }
}
