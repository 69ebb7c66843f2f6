package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway-style probe (kept tiny): band-occupancy distribution of the
  * real documents corpus, to size lshIncrementalCandidatesBounded's
  * default hot-band cap against measured occupancies.
  */
object OccProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = graft.Tables.documents(spark, s"/root/testdata/$sf")
      val bands = graft.ops.Dedup.lshBandTable(docs, "doc_id", "text")
      val occ = bands.groupBy("band").count()
      println(s"$sf: docs=${docs.count()} bands=${occ.count()} " +
        occ.agg(max("count"), expr("percentile(count, 0.99)"), avg("count")).head())
      println("  top5: " + occ.orderBy(desc("count")).limit(5)
        .collect().map(_.getLong(1)).mkString(","))
    }
    spark.stop()
  }
}
