package graft.tools

import java.nio.file.{Files, Paths}

import graft.Tables
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1-equivalent soak (ROADMAP #6 / VERDICT r1 #8): derive 10× sf0.1 data
  * by key-shifted replication, run the shuffle-heavy catalog queries, and
  * record wall time plus spill/shuffle metrics per query (SCALE.md §soak).
  *
  * Replication shifts every key family by a replica stride so FK joins
  * stay valid, components stay disjoint per replica, and the documents
  * corpus gains a 10× planted near-dup density (each text now appears 10
  * times under distinct ids) — a HARDER dedup workload than organic sf1.
  */
object Soak {

  private final class MetricsListener extends SparkListener {
    @volatile var memSpill = 0L
    @volatile var diskSpill = 0L
    @volatile var shuffleWrite = 0L
    @volatile var peakMem = 0L
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        memSpill += m.memoryBytesSpilled
        diskSpill += m.diskBytesSpilled
        shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        peakMem = math.max(peakMem, m.peakExecutionMemory)
      }
    }
    def reset(): Unit = { memSpill = 0; diskSpill = 0; shuffleWrite = 0; peakMem = 0 }
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir = sys.env.getOrElse("SOAK_DIR", "/tmp/graft_sf1")
    val replicas = sys.env.getOrElse("SOAK_REPLICAS", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!Files.exists(Paths.get(s"$dir/lineitem.parquet"))) {
      println(s"SOAK generating ${replicas}x $src -> $dir")
      def rep(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
        val withR = df.crossJoin(
          spark.range(replicas.toLong).select(col("id").as("__r")))
        shifts.foldLeft(withR) { case (d, (c, stride)) =>
          d.withColumn(c, col(c) + col("__r") * stride)
        }.drop("__r")
      }
      def write(df: DataFrame, name: String): Unit =
        df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
      val O = 100000000L; val K = 10000000L; val U = 1000000L
      write(rep(Tables.lineitem(spark, src),
        Map("l_orderkey" -> O, "l_partkey" -> K, "l_suppkey" -> K)), "lineitem")
      write(rep(Tables.orders(spark, src),
        Map("o_orderkey" -> O, "o_custkey" -> K)), "orders")
      write(rep(Tables.customer(spark, src), Map("c_custkey" -> K)), "customer")
      write(rep(Tables.supplier(spark, src), Map("s_suppkey" -> K)), "supplier")
      write(rep(Tables.part(spark, src), Map("p_partkey" -> K)), "part")
      write(rep(Tables.documents(spark, src), Map("doc_id" -> K)), "documents")
      write(rep(Tables.embeddings(spark, src), Map("vec_id" -> K)), "embeddings")
      write(rep(Tables.events(spark, src).drop("ts_ms", "ts_utc"),
        Map("event_id" -> O, "user_id" -> U)), "events")
      Tables.nation(spark, src).write.mode("overwrite").parquet(s"$dir/nation.parquet")
      Tables.region(spark, src).write.mode("overwrite").parquet(s"$dir/region.parquet")
    }

    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)
    // warm page cache + codegen outside timings
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "documents", "embeddings").foreach(t =>
      Tables.table(spark, dir, t).write.format("noop").mode("overwrite").save())
    Tables.events(spark, dir).write.format("noop").mode("overwrite").save()

    val defaultSet = Seq(
      "q_connected_components", "q_self_join_pairs", "q_doc_dedup",
      "q_minhash_lsh", "q_simhash", "q_ngram_jaccard", "q_embed_neardup",
      "q_embed_neardup_bounded", "q_ivf_topk", "q_embedding_topk", "q_flagship_revenue",
      "q_flagship_returns", "q_flagship_nation_rev", "q_group_agg",
      "q_percentile", "q_sessionize", "q_asof_curve", "q_edge_degree",
      "q_exact_dedup", "q_distinct_count", "q_interval_join", "q_fk_join",
      "q_salted_join", "q_multimodal_ann", "q_ann_batch", "q_dup_clusters")
    val soakSet = sys.env.get("SOAK_ONLY")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(defaultSet)
    val results = soakSet.map { name =>
      listener.reset()
      val t0 = System.nanoTime()
      val err = try {
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        ""
      } catch { case e: Throwable => e.getClass.getSimpleName }
      val sec = (System.nanoTime() - t0) / 1e9
      // settle async task-end events before reading the counters
      Thread.sleep(200)
      val mb = 1024.0 * 1024
      println(f"SOAK $name%-26s ${sec}%7.2fs spillMem=${listener.memSpill / mb}%8.1fMB " +
        f"spillDisk=${listener.diskSpill / mb}%8.1fMB shufW=${listener.shuffleWrite / mb}%8.1fMB " +
        f"peakTask=${listener.peakMem / mb}%7.1fMB $err")
      name -> sec
    }
    println(s"""SOAK {"total":${results.map(_._2).sum},"n":${results.size},"replicas":$replicas}""")
    spark.stop()
  }
}
