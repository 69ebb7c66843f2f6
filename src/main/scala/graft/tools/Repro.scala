package graft.tools
import org.apache.spark.sql.SparkSession
object Repro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").cache()
    val model = graft.ops.IvfIndex.build(emb, nlist = 16, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    graft.ops.IvfIndex.save(model, dir)
    val loaded = graft.ops.IvfIndex.load(spark, dir)
    val plan = graft.ops.IvfIndex.searchTopK(loaded, 0L, 10, 2)
      .queryExecution.executedPlan.toString
    plan.linesIterator.filter(l => l.contains("FileScan") || l.contains("PartitionFilters") || l.contains("Location")).foreach(l => println(l.trim.take(300)))
    spark.stop()
  }
}
