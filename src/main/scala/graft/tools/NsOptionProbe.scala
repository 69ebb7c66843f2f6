package graft.tools
import org.apache.spark.sql.SparkSession

/** Probe: can `spark.sql.legacy.parquet.nanosAsLong` be scoped as a
  * per-read datasource option (copied into the scan's hadoopConf via
  * `newHadoopConfWithOptions`) instead of mutating the caller's session
  * conf? Evidence for the Tables.events hygiene fix (VERDICT r12 #2).
  * Fixture: a true `timestamp[ns]` parquet written by pyarrow
  * (`src/test/resources/events_ns/events.parquet`).
  */
object NsOptionProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = "src/test/resources/events_ns/events.parquet"
    println("session conf = " + spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false"))
    try {
      val df = spark.read.option("spark.sql.legacy.parquet.nanosAsLong", "true").parquet(path)
      println("schema: " + df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
      df.select("ts").collect().foreach(r => println("  ts=" + r.get(0)))
      println("OPTION_ROUTE_OK")
    } catch { case e: Throwable => println("OPTION_ROUTE_FAIL: " + e.toString.take(400)) }
    // set-and-restore: conf true only across the eager schema inference,
    // restored BEFORE the action — does execution still decode?
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(path)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
      println("restore schema: " + df.schema.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
      df.select("ts").collect().foreach(r => println("  restore ts=" + r.get(0)))
      println("RESTORE_ROUTE_OK, conf after = " + spark.conf.get("spark.sql.legacy.parquet.nanosAsLong"))
    } catch { case e: Throwable => println("RESTORE_ROUTE_FAIL: " + e.toString.take(400)) }
    try {
      spark.read.parquet(path).collect()
      println("NO_CONF_READ_OK (unexpected — ns fixture should fail without the flag)")
    } catch { case e: Throwable => println("NO_CONF_READ_FAIL (expected): " + e.toString.take(200)) }
    spark.stop()
  }
}
