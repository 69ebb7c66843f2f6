package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale point for `Similarity.semanticDedup` on the 100×-replicated
  * jittered corpus (EmbIdxBench's construction: every vector has ~99
  * planted near-twins at ~0.005 rad): wall, keeper count, and the
  * cell-boundary split rate at corpus-scaled nlist. The method's cost
  * contract is per-cell (n/nlist)² — nlist must grow with the corpus —
  * so the soak runs the nlist ladder and reports the within-cell pair
  * count next to the wall.
  */
object SemDedupSoak {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = graft.Bench.parseCpus(
      args.lift(1).orElse(sys.env.get("SPARK_GRAFT_CPUS")).getOrElse("32")).toString
    val replicas = args.lift(2).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.embeddings(spark, srcDir)
      .select("vec_id", "embedding")
    val reps = spark.range(replicas).select(col("id").as("rep"))
    val corpus = base.crossJoin(reps)
      .select((col("vec_id") * replicas + col("rep")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + (pmod(xxhash64(col("vec_id"), col("rep"), i), lit(4000L))
            .cast("double") / 1e6 - 0.002).cast("float")))
          .as("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    val n = corpus.count()
    val nBases = n / replicas
    println(s"corpus: $n vectors ($replicas x $nBases planted clusters)")

    Seq(256, 1024).foreach { nlist =>
      val t = System.nanoTime()
      val res = graft.ops.Similarity
        .semanticDedup(corpus, nlist = nlist, minCos = 0.99)
        .localCheckpoint()
      val wall = (System.nanoTime() - t) / 1e9
      val keepers = res.filter(col("is_dup") === 0).count()
      // a planted cluster that stayed whole keeps exactly 1; boundary
      // splits add one keeper per extra fragment
      val splitFrags = keepers - nBases
      val cells = res.select("cell").distinct().count()
      println(f"nlist=$nlist%5d  wall=${wall}%7.1fs  keepers=$keepers%7d " +
        f"(extra fragments=$splitFrags%d over $nBases%d clusters)  liveCells=$cells%d")
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(res)
    }
    spark.stop()
  }
}
