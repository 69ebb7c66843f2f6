package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Density harness for the embedding band index: home-bucket occupancy,
  * Hamming<=1 match count, and the catalog key + hand-built pieces on
  * the real sf0.001 embeddings (fixture sanity for SimilaritySpec and
  * the q_embed_dedup_incremental rows-only gate).
  */
object EmbIdxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val home = graft.ops.Similarity.embBandTable(emb, "vec_id", "embedding")
    home.groupBy("band").count().orderBy(desc("count")).show(5, false)
    println("distinct bands: " + home.select("band").distinct().count() +
      " of " + emb.count())
    val probes = graft.ops.Similarity.embProbeTable(emb, "vec_id", "embedding")
    val j = home.join(probes.select(col("doc_id").as("n"), col("band")), "band")
      .filter(col("doc_id") =!= col("n")).count()
    println("hamming<=1 directed matches: " + j)
    val k = graft.SparkEntry.queries("q_embed_dedup_incremental")(
      spark, "/root/testdata/sf0.001")
    println("key rows: " + k.count())
    // and the pieces by hand:
    val history = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val arrivals = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    val dir = java.nio.file.Files.createTempDirectory("embkey").toString + "/idx"
    graft.ops.Dedup.bandIndexAppendPrecomputed(dir,
      graft.ops.Similarity.embBandTable(history, "vec_id", "embedding"))
    println("stored rows: " + spark.read.schema(graft.ops.Dedup.bandSchemaBkt)
      .parquet(dir).count())
    println("probe rows: " + graft.ops.Similarity.embIndexProbe(dir, arrivals).count())
    org.apache.hadoop.fs.FileUtil.fullyDelete(
      new java.io.File(dir).getParentFile)
    spark.stop()
  }
}
